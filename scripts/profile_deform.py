"""Sub-stage on-chip timing of the deform hot path (profile_synth says
deform = ~12.6 of 16 ms/vol at 256^3, B=4).

Times the real composition pieces of ``_deform_pair_small_fields``:
field upsamples, mask path, U matmul stage, hat passes, full warp —
each with the chained-fori methodology under the production scopes.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from fetalsyngen_tpu.generator.config import GeneratorCfg, IntensityCfg
from fetalsyngen_tpu.generator import pipeline as pp
from fetalsyngen_tpu.generator.params import sample_params
from fetalsyngen_tpu.ops.affine import centered_grid, make_affine_matrix
from fetalsyngen_tpu.ops.linops import precision_scope, storage_scope, zoom_mm
from fetalsyngen_tpu.ops import warp as W
from fetalsyngen_tpu.parallel.input_pipeline import _production_scopes
from fetalsyngen_tpu.generator.params import field_key

SHAPE = (256, 256, 256)
B = 4
ITERS = 6


def make_cfg():
    labels = tuple([0] + list(range(10, 50)))
    gen_classes = tuple([0] + [10] * 10 + [20] * 10 + [30] * 10 + list(range(40, 50)))
    return GeneratorCfg(
        shape=SHAPE,
        resolution=(0.5, 0.5, 0.5),
        intensity=IntensityCfg(1, 6, labels, gen_classes),
    )


CFG = make_cfg()


def _params(k):
    return sample_params(k, CFG, {"deform_apply": True, "flip": False})


def _smalls(key, p):
    """The pre-combined small fields + A pieces (cheap; shared by variants)."""
    cfg = CFG
    shape = cfg.shape
    smax = cfg.deform.small_field_max()
    A = make_affine_matrix(p.rotations, p.shears, p.scalings)
    f_small = p.nonlin_std * jax.random.normal(
        field_key(key, "field_nonlin"), (3, *smax), jnp.float32
    )
    U, L = W.ul_decompose(A)
    lim = W.FIELD_LIM
    gx_s = f_small[0]
    gy_s = L[1, 0] * f_small[0] + f_small[1]
    gz_s = L[2, 0] * f_small[0] + L[2, 1] * f_small[1] + f_small[2]
    h_s = jnp.einsum("ij,jabc->iabc", A, f_small, precision=jax.lax.Precision.HIGHEST)
    factor = jnp.asarray(shape, jnp.float32) / p.size_F_small.astype(jnp.float32)
    return A, (gx_s, gy_s, gz_s), h_s, factor, lim


def _zoomP(small, perm, factor, p):
    shape = CFG.shape
    out_shape = tuple(shape[q] for q in perm)
    fac = jnp.stack([factor[q] for q in perm])
    in_shape = jnp.stack([p.size_F_small[q] for q in perm])
    return zoom_mm(jnp.transpose(small, perm), out_shape, fac, in_shape=in_shape)


def _fields3(key, p):
    A, (gx_s, gy_s, gz_s), h_s, factor, lim = _smalls(key, p)
    with precision_scope(None), storage_scope(None):
        gyT = jnp.clip(_zoomP(gy_s, (0, 2, 1), factor, p), -lim, lim)
        gz = jnp.clip(_zoomP(gz_s, (0, 1, 2), factor, p), -lim, lim)
        gxT = jnp.clip(_zoomP(gx_s, (1, 2, 0), factor, p), -lim, lim)
    return A, gyT, gz, gxT


def _mask(key, p):
    shape = CFG.shape
    A, _, h_s, factor, lim = _smalls(key, p)
    c2 = (jnp.asarray(shape, jnp.float32) - 1.0) / 2.0
    with precision_scope(None), storage_scope(None):
        Hx = _zoomP(h_s[0], (0, 1, 2), factor, p)
        Hy = _zoomP(h_s[1], (0, 1, 2), factor, p)
        Hz = _zoomP(h_s[2], (0, 1, 2), factor, p)
    xc, yc, zc = centered_grid(shape)
    Xr = A[0, 0] * xc + A[0, 1] * yc + A[0, 2] * zc + c2[0] + Hx
    Yr = A[1, 0] * xc + A[1, 1] * yc + A[1, 2] * zc + c2[1] + Hy
    Zr = A[2, 0] * xc + A[2, 1] * yc + A[2, 2] * zc + c2[2] + Hz
    Xc = jnp.clip(Xr, 0, shape[0] - 1)
    Yc = jnp.clip(Yr, 0, shape[1] - 1)
    Zc = jnp.clip(Zr, 0, shape[2] - 1)
    shift = jnp.stack(
        [jnp.floor(jnp.min(Xc)), jnp.floor(jnp.min(Yc)), jnp.floor(jnp.min(Zc))]
    )
    ok = (
        (Xc - shift[0] > 0)
        & (Yc - shift[1] > 0)
        & (Zc - shift[2] > 0)
        & (Xc - shift[0] <= shape[0] - 1)
        & (Yc - shift[1] <= shape[1] - 1)
        & (Zc - shift[2] <= shape[2] - 1)
    )
    return ok


def timed(name, core):
    """core(k, a, b) -> scalar probe; a = f32 vol, b = i32 vol."""

    @jax.jit
    def chain(key, va, vb):
        def body(i, carry):
            key, acc = carry
            keys = jax.random.split(key, B + 1)
            probe = jax.vmap(core)(keys[1:], va, vb)
            return keys[0], acc + jnp.sum(probe)

        _, acc = jax.lax.fori_loop(0, ITERS, body, (key, jnp.float32(0)))
        return acc

    rng = np.random.default_rng(0)
    va = jnp.asarray(rng.normal(size=(B, *SHAPE)), jnp.float32)
    vb = jnp.asarray(rng.integers(0, 40, size=(B, *SHAPE)), jnp.float32)
    key = jax.random.PRNGKey(0)
    float(chain(key, va, vb))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(key, va, vb))
        best = min(best, (time.perf_counter() - t0) / (ITERS * B))
    print(f"{name:34s} {best * 1e3:8.2f} ms/vol", flush=True)
    return best


def main():
    shape = CFG.shape
    c1 = (jnp.asarray(shape, jnp.float32) - 1.0) / 2.0

    def full(k, a, b):
        p = _params(k)
        with _production_scopes():
            lin, near = pp._deform_pair_small_fields(k, p, CFG, *_Ac(p), a, b)
        return jnp.mean(lin[0]) + jnp.sum(near[0][::64, ::64, ::64])

    def _Ac(p):
        A = make_affine_matrix(p.rotations, p.shears, p.scalings)
        return A, c1, c1

    def fields3(k, a, b):
        p = _params(k)
        with _production_scopes():
            A, gyT, gz, gxT = _fields3(k, p)
        return jnp.mean(gyT) + jnp.mean(gz) + jnp.mean(gxT)

    def mask_only(k, a, b):
        p = _params(k)
        with _production_scopes():
            ok = _mask(k, p)
        return jnp.mean(ok.astype(jnp.float32))

    def warp_only(k, a, b):
        """pair warp from fields built at FIXED tiny cost outside scopes is
        impossible inside one jit without carrying them; approximate by
        building fields3 too — report (warp_only - fields3)."""
        p = _params(k)
        with _production_scopes():
            A, gyT, gz, gxT = _fields3(k, p)
            t = jnp.zeros(3, jnp.float32)
            oa, ob = W.warp_affine_field_pair_pre(a, b, A, t, gyT, gz, gxT)
        return jnp.mean(oa) + jnp.sum(ob[::64, ::64, ::64])

    def u_stage(k, a, b):
        p = _params(k)
        with _production_scopes():
            A = make_affine_matrix(p.rotations, p.shears, p.scalings)
            U, L = W.ul_decompose(A)
            t = jnp.zeros(3, jnp.float32)
            modes = (False, True)
            xa, xb = a, b
            xa, xb = W._row_affine_matmul_pair(xa, xb, U[2, 2], 0.0, t[2], modes, out_order="ikj")
            xa, xb = W._row_affine_matmul_pair(xa, xb, U[1, 1], U[1, 2], t[1], modes, out_order="kji")
            xa, xb = W._row_affine_matmul_pair(xa, xb, 1.0, U[0, 2], 0.0, modes, out_order="jik")
            xa, xb = W._row_affine_matmul_pair(xa, xb, U[0, 0], U[0, 1], t[0], modes, out_order="kij")
        return jnp.mean(xa) + jnp.sum(xb[::64, ::64, ::64])

    def hats(k, a, b):
        p = _params(k)
        with _production_scopes():
            A, gyT, gz, gxT = _fields3(k, p)
            U, L = W.ul_decompose(A)
            D, H, Wd = shape
            xa, xb = a, b
            xa, xb = W.hat_pass_pair(
                xa, xb, (L[1, 0], 0.0, 1.0, 0.0), gyT, (D, Wd, H),
                W.MAXSPAN_FIELD, unit_slope=True,
            )
            xa, xb = jnp.transpose(xa, (0, 2, 1)), jnp.transpose(xb, (0, 2, 1))
            xa, xb = W.hat_pass_pair(
                xa, xb, (L[2, 0], L[2, 1], 1.0, 0.0), gz, (D, H, Wd),
                W.MAXSPAN_FIELD, unit_slope=True,
            )
            xa, xb = jnp.transpose(xa, (1, 2, 0)), jnp.transpose(xb, (1, 2, 0))
            xa, xb = W.hat_pass_pair(
                xa, xb, (0.0, 0.0, 1.0, 0.0), gxT, (H, Wd, D),
                W.MAXSPAN_FIELD, unit_slope=True,
            )
            xa = jnp.transpose(xa, (2, 0, 1))
            xb = jnp.transpose(xb, (2, 0, 1))
        return jnp.mean(xa) + jnp.sum(xb[::64, ::64, ::64])

    f3 = timed("fields3 (3 zoom chains)", fields3)
    m = timed("mask (3 zooms + grid + min + ok)", mask_only)
    u = timed("u_stage (4 matmul pair passes)", u_stage)
    h = timed("hats+fields3 (3 hat pair + tps)", hats)
    wo = timed("warp_pre+fields3 (6 passes)", warp_only)
    fl = timed("full _deform_pair_small_fields", full)
    print(f"{'-> hats alone (h - fields3)':34s} {(h - f3) * 1e3:8.2f} ms")
    print(f"{'-> warp alone (wo - fields3)':34s} {(wo - f3) * 1e3:8.2f} ms")
    print(f"{'-> mask-zooms+grid (m)':34s} {m * 1e3:8.2f} ms")
    print(f"{'-> full - (wo + m)':34s} {(fl - wo - m) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
