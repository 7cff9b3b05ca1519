"""Per-op on-chip timing of the extract/recon chain constituents."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from fetalsyngen_tpu.generator.artifacts import scanner as sc
from fetalsyngen_tpu.ops.linops import einsum_store
from fetalsyngen_tpu.ops.warp import hat_pass, hat_pass_pair
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
    print(f"{name:40s} {best * 1e3:8.2f} ms/fire{bw}")
    return best


def main():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((CUBE, CUBE, CUBE), np.float32))
    st = jnp.asarray(rng.random((NSG, CUBE, CUBE), np.float32))
    stT = jnp.asarray(rng.random((CUBE, CUBE, NSG), np.float32))

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
    Mzn = sc.interp_matrix(z0 + gap_vox * jnp.arange(NSG, dtype=jnp.float32), CUBE)

    vol_gb = 2 * CUBE**3 * 4 / 1e9  # f32 r+w
    st_gb = 2 * NSG * CUBE * CUBE * 4 / 1e9

    timed(
        "hat dz unit-slope lane-affine (384^3)",
        lambda k, v: hat_pass(
            v, (0.0, 0.0, 1.0, 0.0), dz_tab, (CUBE, CUBE, CUBE), 48, False, unit_slope=True
        ),
        vol,
        gb=vol_gb,
    )
    timed(
        "einsum Mzn (384^3 -> 128x384x384)",
        lambda k, v: einsum_store("oi,jki->okj", Mzn, v),
        vol,
        gb=CUBE**3 * 4 / 1e9 + NSG * CUBE * CUBE * 4 / 1e9,
    )
    timed(
        "hat dv per-slice (128,384,384)",
        lambda k, s: hat_pass(s, dv_tab, None, (NSG, CUBE, CUBE), 48, False, unit_slope=True),
        st,
        gb=st_gb,
    )
    timed(
        "transpose (0,2,1) of (128,384,384)",
        lambda k, s: jnp.transpose(s, (0, 2, 1)),
        st,
        gb=st_gb,
    )
    timed(
        "transpose (1,2,0) of (128,384,384)",
        lambda k, s: jnp.transpose(s, (1, 2, 0)),
        st,
        gb=st_gb,
    )
    timed(
        "hat_pair dz lane-affine (384,384,128)",
        lambda k, a, b: hat_pass_pair(
            a, b, (0.0, 0.0, 1.0, 0.0),
            jnp.stack([-G[:, 0, 2] * rs / gap_vox, -G[:, 0, 1] * rs / gap_vox, G[:, 0, 3] * 0.0]),
            (CUBE, CUBE, NSG), 48, modes=(False, False), unit_slope=True,
        ),
        stT,
        stT,
        gb=2 * st_gb,
    )
    timed(
        "hat pair dv+du per-slice (128,384,384)",
        lambda k, a, b: hat_pass_pair(
            a, b, dv_tab, None, (NSG, CUBE, CUBE), 48, modes=(False, False), unit_slope=True
        ),
        st,
        st,
        gb=2 * st_gb,
    )


if __name__ == "__main__":
    main()
