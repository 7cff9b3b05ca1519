"""Isolate which construct makes the hat kernel slow (timing-only variants).

Variants (V1+ give WRONG results; this is a cost experiment only):
  V0 full     — current kernel logic
  V1 no-roll  — skip the 7-roll sub-128 alignment ladder
  V2 static   — static window (no dynamic slice, no rolls, no n0 min/max)
  V3 no-span  — static span (no max reduction / span_dyn), keep rolls
  V4 taps4    — static window + only 4 taps
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

S = 384
D = 384
H = 384
B = 32
LB = 384
PAD = max(128, LB)
WIDTH = S + PAD + LB + 128
WIN = LB + 256
MAXSPAN = 48
TAP_CHUNK = 8
_BIG = 1e9


def make_kernel(variant):
    def kernel(coef_ref, x_ref, disp_ref, o_ref, acc_ref, s_ref):
        r_blk = pl.program_id(0)
        ci = coef_ref[0, 0, 0]
        cj = coef_ref[0, 0, 1]
        ck = coef_ref[0, 0, 2]
        bias = coef_ref[0, 0, 3]

        xf = x_ref[:].astype(jnp.float32)
        s_ref[:, PAD : PAD + S] = xf
        s_ref[:, :PAD] = jnp.broadcast_to(xf[:, :1], (B, PAD))
        s_ref[:, PAD + S :] = jnp.broadcast_to(xf[:, S - 1 : S], (B, WIDTH - PAD - S))

        rows = r_blk * B + jax.lax.broadcasted_iota(jnp.int32, (B, LB), 0)
        row_i = (rows // H).astype(jnp.float32)
        row_j = (rows % H).astype(jnp.float32)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (B, LB), 1)
        lanes_f = lanes.astype(jnp.float32)
        pos = ci * row_i + cj * row_j + ck * lanes_f + bias
        lt = disp_ref[:]
        pos = pos + lt[0, :][None, :] * row_i + lt[1, :][None, :] * row_j + lt[2, :][None, :]

        sat_lo = pos <= 0.0
        sat_hi = pos >= S - 1.0
        valid = jnp.logical_not(jnp.logical_or(sat_lo, sat_hi))
        rel = pos - lanes_f

        if variant in ("v0", "v1", "v3"):
            rel_v = jnp.where(valid, rel, _BIG)
            n0 = jnp.floor(jnp.min(rel_v)).astype(jnp.int32)
            n0 = jnp.clip(n0, -PAD, S - 1)
        else:
            n0 = jnp.int32(-8)

        base = PAD + n0
        if variant in ("v0", "v3"):
            q = base // 128
            off = base - q * 128
            win = s_ref[:, pl.ds(pl.multiple_of(q * 128, 128), WIN)]
            for b in range(7):
                bit = ((off >> b) & 1) == 1
                win = jnp.where(bit, pltpu.roll(win, WIN - (1 << b), 1), win)
        elif variant == "v1":
            q = base // 128
            win = s_ref[:, pl.ds(pl.multiple_of(q * 128, 128), WIN)]
        else:
            win = s_ref[:, PAD - 64 : PAD - 64 + WIN]

        if variant in ("v0", "v1", "v2"):
            mx = jnp.max(jnp.where(valid, rel, -_BIG))
            span_dyn = jnp.floor(mx).astype(jnp.int32) - n0 + 2
        else:
            span_dyn = jnp.int32(8)

        maxspan = 4 if variant == "v4" else MAXSPAN
        d0 = jnp.clip(rel - n0.astype(jnp.float32), 0.0, maxspan - 1.0)
        acc_ref[:] = jnp.zeros((B, LB), jnp.float32)
        for c0 in range(0, maxspan, TAP_CHUNK):

            @pl.when(c0 < span_dyn)
            def _chunk(c0=c0):
                acc = acc_ref[:]
                for m in range(c0, min(c0 + TAP_CHUNK, maxspan)):
                    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(d0 - float(m)))
                    acc = acc + wgt * win[:, m : m + LB]
                acc_ref[:] = acc

        acc = acc_ref[:]
        lo_edge = s_ref[:, PAD : PAD + 1]
        hi_edge = s_ref[:, PAD + S - 1 : PAD + S]
        o_ref[:] = jnp.where(sat_lo, lo_edge, jnp.where(sat_hi, hi_edge, acc))

    return kernel


def run_variant(variant, x2d, coefs, disp):
    R = x2d.shape[0]
    out = pl.pallas_call(
        make_kernel(variant),
        out_shape=jax.ShapeDtypeStruct((R, LB), jnp.float32),
        grid=(R // B,),
        in_specs=[
            pl.BlockSpec((1, 1, 4), lambda r: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, S), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LB), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, LB), lambda r: (r, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, LB), jnp.float32),
            pltpu.VMEM((B, WIDTH), jnp.float32),
        ],
    )(coefs, x2d, disp)
    return out


def timed(name, variant, x2d, coefs, disp):
    fn = functools.partial(run_variant, variant)

    @jax.jit
    def chain(key, x):
        def body(i, acc):
            eps = jax.random.uniform(jax.random.fold_in(key, i), ()) * 1e-6
            r = fn(x + eps, coefs, disp)
            return acc + jnp.sum(r)

        return jax.lax.fori_loop(0, 8, body, 0.0)

    key = jax.random.PRNGKey(0)
    float(chain(key, x2d))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(key, x2d))
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"{name:24s} {best * 1e3:8.2f} ms/fire")


def main():
    rng = np.random.default_rng(0)
    x2d = jnp.asarray(rng.random((D * H, S), np.float32))
    coefs = jnp.asarray(np.array([[[0.0, 0.0, 1.0, 0.3]]], np.float32))
    disp = jnp.asarray(rng.normal(0, 0.02, (3, LB)).astype(np.float32))
    for v in ("v0", "v1", "v2", "v3", "v4"):
        timed(v, v, x2d, coefs, disp)


if __name__ == "__main__":
    main()
