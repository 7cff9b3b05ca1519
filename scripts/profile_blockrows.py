"""Experiment: hat-pass cost vs block_rows / tap_chunk at slice-pass shapes.

Hypothesis: the passes are dominated by per-grid-step fixed cost (the ~22
predicated tap-chunk regions each step), so whole-slice row blocks (384)
should cut the pass time several-fold at unchanged tap math.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from fetalsyngen_tpu.generator.artifacts import scanner as sc
from fetalsyngen_tpu.ops import warp
from fetalsyngen_tpu.parallel.input_pipeline import _production_scopes

CUBE = 384
NSG = 128


def timed(name, fn, *args, gb=None):
    @jax.jit
    def chain(key, *a):
        def body(i, acc):
            ki = jax.random.fold_in(key, i)
            eps = jax.random.uniform(ki, ()) * 1e-6
            ap = [
                x + eps
                if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 and x.ndim >= 3
                else x
                for x in jax.tree.leaves(a)
            ]
            ap = jax.tree.unflatten(jax.tree.structure(a), ap)
            with _production_scopes():
                r = fn(ki, *ap)
            return acc + sum(jnp.sum(x) for x in jax.tree.leaves(r))

        return jax.lax.fori_loop(0, 8, body, 0.0)

    key = jax.random.PRNGKey(0)
    float(chain(key, *args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(key, *args))
        best = min(best, (time.perf_counter() - t0) / 8)
    bw = f"  ({gb / best:6.0f} GB/s)" if gb else ""
    print(f"{name:44s} {best * 1e3:8.2f} ms/fire{bw}", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((CUBE, CUBE, CUBE), np.float32))
    st = jnp.asarray(rng.random((NSG, CUBE, CUBE), np.float32))

    G = jnp.asarray(rng.normal(0, 0.02, (NSG, 3, 4)).astype(np.float32))
    G = G.at[:, 0, 3].add(jnp.arange(NSG) * 3.0 + 60.0)
    rs, gap_vox, z0 = jnp.float32(2.2), jnp.float32(4.0), jnp.float32(60.0)
    c_ss = (CUBE - 1) / 2.0
    dz, dv_tab, du_tab = sc._slice_coef_tables(G, rs, c_ss, z0, gap_vox, NSG)
    lanes = jnp.arange(CUBE, dtype=jnp.float32)
    n_near = jnp.clip(jnp.round((lanes - z0) / gap_vox), 0, NSG - 1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (CUBE, NSG), 1)
    Nz = (cols == n_near[:, None]).astype(jnp.float32)
    a123 = jnp.einsum("zn,nc->zc", Nz, dz["coef"])
    dz_tab = jnp.stack(
        [a123[:, 0] * rs, a123[:, 1] * rs, a123[:, 2] - (a123[:, 0] + a123[:, 1]) * rs * c_ss]
    )

    vol_gb = 2 * CUBE**3 * 4 / 1e9
    st_gb = 2 * NSG * CUBE * CUBE * 4 / 1e9

    for br in (64, 128, 384):
        warp.BLOCK_ROWS = br
        # defeat the jit cache (BLOCK_ROWS isn't in the key): unjitted impl,
        # traced fresh inside each timed() chain
        impl = warp._hat_pass_impl.__wrapped__

        def hp(v, coefs, disp, shape, maxspan):
            return impl(
                v, coefs, disp, shape, maxspan, False, out_len=None,
                unit_slope=True, store=None,
            )

        timed(
            f"dz 384^3 lane-affine br={br}",
            lambda k, v: hp(v, (0.0, 0.0, 1.0, 0.0), dz_tab, (CUBE, CUBE, CUBE), 48),
            vol,
            gb=vol_gb,
        )
        timed(
            f"dv per-slice (128,384,384) br={br}",
            lambda k, s: hp(s, dv_tab, None, (NSG, CUBE, CUBE), 48),
            st,
            gb=st_gb,
        )


if __name__ == "__main__":
    main()
