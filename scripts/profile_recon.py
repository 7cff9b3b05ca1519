"""Drill-down on-chip timing of one stack's reconstruction sub-stages."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from fetalsyngen_tpu.generator.artifacts import scanner as sc
from fetalsyngen_tpu.parallel.input_pipeline import _production_scopes

CUBE = 384
NSG = 128
OUT = (256, 256, 256)


def timed(name, fn, *args):
    @jax.jit
    def chain(key, *a):
        def body(i, acc):
            ki = jax.random.fold_in(key, i)
            eps = jax.random.uniform(ki, ()) * 1e-6
            ap = [x + eps if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 and x.ndim >= 3 else x for x in jax.tree.leaves(a)]
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
    print(f"{name:36s} {best * 1e3:8.2f} ms/fire")
    return best


def main():
    rng = np.random.default_rng(0)
    slices = jnp.asarray(rng.random((NSG, CUBE, CUBE), np.float32))
    keep_f = (jnp.arange(NSG) < 80).astype(jnp.float32)
    Grec = jnp.asarray(rng.normal(0, 0.02, (NSG, 3, 4)).astype(np.float32))
    Grec = Grec.at[:, 0, 3].add(jnp.arange(NSG) * 3.0 + 60.0)
    rs = jnp.float32(2.2)
    gap_vox = jnp.float32(4.0)
    z0 = jnp.float32(60.0)
    sig_rec = jnp.asarray([2.0, 1.0], jnp.float32)
    qinv = jnp.int32(5)
    iang = jnp.asarray([0.12, -0.05, 0.21], jnp.float32)
    iscl = jnp.float32(1.0)
    idlt = jnp.asarray([60.0, 62.0, 58.0], jnp.float32)

    def full(key, s):
        return sc._recon_one(
            s, keep_f, Grec, rs, gap_vox, z0, sig_rec, qinv, iang, iscl, idlt,
            CUBE, NSG, OUT,
        )

    # pre-warp chain only (stop before warp_rigid_pair_traced)
    from fetalsyngen_tpu.ops.linops import (
        _prec, apply_axis_matrix, einsum_store, toeplitz_blur_matrix,
    )
    from fetalsyngen_tpu.ops.warp import warp_rigid_pair_traced
    from fetalsyngen_tpu.generator.artifacts.scanner import (
        _BLUR_HALF, _inplane_coef_tables, hat_pass, hat_pass_pair, interp_matrix,
    )

    c_ss = (CUBE - 1) / 2.0
    lanes = jnp.arange(CUBE, dtype=jnp.float32)
    nidx = jnp.arange(NSG, dtype=jnp.float32)
    base_z = z0 + nidx * gap_vox
    g1, g2, g3 = Grec[:, 0, 1], Grec[:, 0, 2], Grec[:, 0, 3]
    dzr_tab = jnp.stack(
        [-g2 * rs / gap_vox, -g1 * rs / gap_vox,
         (-(g3 - base_z) + (g1 + g2) * rs * c_ss) / gap_vox]
    )
    dv_tab, du_tab = _inplane_coef_tables(Grec, rs, c_ss, -1.0)
    inv_scale_m = interp_matrix((lanes - c_ss) / rs + c_ss, CUBE)
    sigz_m = toeplitz_blur_matrix(sig_rec[0], CUBE, _BLUR_HALF)
    inv_scale_blur_m = jnp.matmul(
        inv_scale_m, toeplitz_blur_matrix(sig_rec[1], CUBE, _BLUR_HALF),
        precision=_prec(),
    )
    Mn2z = jnp.matmul(sigz_m, interp_matrix((lanes - z0) / gap_vox, NSG), precision=_prec())

    def prewarp(key, s):
        masked = s * keep_f[:, None, None]
        x = hat_pass(masked, du_tab, None, (NSG, CUBE, CUBE), 48, False, unit_slope=True)
        x = jnp.transpose(x, (0, 2, 1))
        x = hat_pass(x, dv_tab, None, (NSG, CUBE, CUBE), 48, False, unit_slope=True)
        x = jnp.transpose(x, (1, 2, 0))
        w = jnp.broadcast_to(keep_f[None, None, :], (CUBE, CUBE, NSG)).astype(jnp.float32)
        x, w = hat_pass_pair(
            x, w, (0.0, 0.0, 1.0, 0.0), dzr_tab, (CUBE, CUBE, NSG), 48,
            modes=(False, False), unit_slope=True,
        )
        return x, w

    def expand_spread(key, xw):
        x, w = xw
        x = einsum_store("oi,jki->okj", Mn2z, x)
        w = einsum_store("oi,jki->okj", Mn2z, w)

        def spread(y):
            y = apply_axis_matrix(y, inv_scale_blur_m, 1)
            y = apply_axis_matrix(y, inv_scale_blur_m, 2)
            return y

        return spread(x), spread(w)

    def warp_pair(key, xw):
        x, w = xw
        return warp_rigid_pair_traced(
            x, w, qinv, iang, iscl, idlt, out_shape=OUT, modes=(False, False)
        )

    xw0 = (
        jnp.asarray(rng.random((CUBE, CUBE, NSG), np.float32)),
        jnp.asarray(rng.random((CUBE, CUBE, NSG), np.float32)),
    )
    vw0 = (
        jnp.asarray(rng.random((CUBE, CUBE, CUBE), np.float32)),
        jnp.asarray(rng.random((CUBE, CUBE, CUBE), np.float32)),
    )

    timed("recon full (384)", full, slices)
    timed("recon pre-warp hats", prewarp, slices)
    timed("recon expand+spread", expand_spread, xw0)
    timed("recon inverse warp pair", warp_pair, vw0)


if __name__ == "__main__":
    main()
