"""Probe: cost of an IN-KERNEL (BR, LB) <-> (LB, BR) block transpose on
Mosaic, vs a standalone XLA transpose pass. Decides whether the hat kernels
can fold their inter-pass pair transposes into the kernel I/O.

Variants (per (256,256,256) volume pair, B=4):
  copy        — pallas identity copy of the pair (same grid/blocks as hats)
  copy+tp_out — kernel writes jnp.transpose(block) into a transposed output
  xla_tp      — plain jnp.transpose (0,2,1) of the pair (the status quo)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

D = H = W = 256
BR = 128
LB = 256
B = 4
ITERS = 6
R = D * H


def _copy_kernel(xa_ref, xb_ref, oa_ref, ob_ref):
    oa_ref[:] = xa_ref[:]
    ob_ref[:] = xb_ref[:]


def _tp_kernel(xa_ref, xb_ref, oa_ref, ob_ref):
    oa_ref[:] = jnp.transpose(xa_ref[:], (1, 0))
    ob_ref[:] = jnp.transpose(xb_ref[:], (1, 0))


def pallas_copy(xa, xb):
    xa = xa.reshape(R, W)
    xb = xb.reshape(R, W)
    spec = pl.BlockSpec((BR, LB), lambda r: (r, 0), memory_space=pltpu.VMEM)
    oa, ob = pl.pallas_call(
        _copy_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, W), jnp.float32),
            jax.ShapeDtypeStruct((R, W), jnp.float32),
        ),
        grid=(R // BR,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
    )(xa, xb)
    return oa.reshape(D, H, W), ob.reshape(D, H, W)


def pallas_tp(xa, xb):
    """(i, j, k) -> (i, k, j): block (64 j's, all k) -> (all k, 64 j's)."""
    xa = xa.reshape(R, W)
    xb = xb.reshape(R, W)
    jpb = H // BR  # j-blocks per i slice
    in_spec = pl.BlockSpec((BR, LB), lambda r: (r, 0), memory_space=pltpu.VMEM)
    # out 2D view: (D*W, H); block (LB, BR) at rows (i*W .. ), cols j0
    out_spec = pl.BlockSpec(
        (LB, BR), lambda r: (r // jpb, r % jpb), memory_space=pltpu.VMEM
    )
    oa, ob = pl.pallas_call(
        _tp_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((D * W, H), jnp.float32),
            jax.ShapeDtypeStruct((D * W, H), jnp.float32),
        ),
        grid=(R // BR,),
        in_specs=[in_spec, in_spec],
        out_specs=(out_spec, out_spec),
    )(xa, xb)
    return oa.reshape(D, W, H), ob.reshape(D, W, H)


def xla_tp(xa, xb):
    return jnp.transpose(xa, (0, 2, 1)), jnp.transpose(xb, (0, 2, 1))


def timed(name, fn):
    @jax.jit
    def chain(key, va, vb):
        def body(i, carry):
            key, acc = carry
            k2 = jax.random.fold_in(key, i)
            eps = jax.random.uniform(k2, ()) * 1e-6
            oa, ob = jax.vmap(fn)(va + eps, vb)
            return k2, acc + jnp.mean(oa) + jnp.mean(ob)

        _, acc = jax.lax.fori_loop(0, ITERS, body, (key, jnp.float32(0)))
        return acc

    rng = np.random.default_rng(0)
    va = jnp.asarray(rng.normal(size=(B, D, H, W)), jnp.float32)
    vb = jnp.asarray(rng.normal(size=(B, D, H, W)), jnp.float32)
    key = jax.random.PRNGKey(0)
    float(chain(key, va, vb))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(key, va, vb))
        best = min(best, (time.perf_counter() - t0) / (ITERS * B))
    print(f"{name:16s} {best * 1e3:8.3f} ms/vol", flush=True)


def check():
    rng = np.random.default_rng(1)
    xa = jnp.asarray(rng.normal(size=(D, H, W)), jnp.float32)
    xb = jnp.asarray(rng.normal(size=(D, H, W)), jnp.float32)
    oa, ob = pallas_tp(xa, xb)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(xa).transpose(0, 2, 1))
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(xb).transpose(0, 2, 1))
    print("pallas_tp correct", flush=True)


if __name__ == "__main__":
    check()
    timed("pallas copy", pallas_copy)
    timed("pallas tp_out", pallas_tp)
    timed("xla transpose", xla_tp)
