"""Drill-down on-chip timing of one stack's acquisition sub-stages.

Times the big-frame (cube=384) stack acquire broken into: rigid warp,
extract chain, coarse validity, slice artifacts — plus the coarse warp
alone. Chained-iteration timing inside one jit (per verify notes).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from fetalsyngen_tpu.generator.artifacts import scanner as sc
from fetalsyngen_tpu.parallel.input_pipeline import _production_scopes

CUBE = 384
NSG = 128
F = 4


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
    r = chain(key, *args)
    float(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(key, *args))
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"{name:32s} {best * 1e3:8.2f} ms/fire")
    return best


def main():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((256, 256, 256), np.float32))
    mask = (jnp.linalg.norm(jnp.indices((256, 256, 256)) - 128.0, axis=0) < 80).astype(
        jnp.float32
    )
    vol_p = sc._pad_centered(vol, CUBE)
    mask_p = sc._pad_centered(mask, CUBE)
    cmask = sc._coarse_mask(mask_p, F)

    q_idx = jnp.int32(3)
    angles = jnp.asarray([0.11, -0.07, 0.19], jnp.float32)
    wscale = jnp.float32(1.0)
    wdelta = jnp.asarray([1.5, -2.0, 0.7], jnp.float32)
    G = jnp.asarray(rng.normal(0, 0.02, (NSG, 3, 4)).astype(np.float32))
    G = G.at[:, 0, 3].add(jnp.arange(NSG) * 3.0 + 60.0)
    rs = jnp.float32(2.2)
    gap_vox = jnp.float32(4.0)
    z0 = jnp.float32(60.0)
    sig = jnp.asarray([2.0, 1.0, 1.0], jnp.float32)
    thr_frac = jnp.float32(0.2)
    ns_count = jnp.int32(80)
    gamma = jnp.float32(1.1)
    gamma_on = jnp.float32(1.0)
    sigma = jnp.float32(2.0)
    void_prob = jnp.float32(0.5)
    threshold = jnp.float32(10.0)

    from fetalsyngen_tpu.ops.linops import toeplitz_blur_matrix, _prec
    from fetalsyngen_tpu.ops.warp import warp_rigid_pair_traced

    c_ss = (CUBE - 1) / 2.0
    lanes = jnp.arange(CUBE, dtype=jnp.float32)
    scale_m = sc.interp_matrix((lanes - c_ss) * rs + c_ss, CUBE)
    sb1 = jnp.matmul(scale_m, toeplitz_blur_matrix(sig[1], CUBE, sc._BLUR_HALF), precision=_prec())
    sb2 = jnp.matmul(scale_m, toeplitz_blur_matrix(sig[2], CUBE, sc._BLUR_HALF), precision=_prec())
    post = (toeplitz_blur_matrix(sig[0], CUBE, sc._BLUR_HALF), sb1, sb2)

    def warp_only(key, v):
        Wv, _ = warp_rigid_pair_traced(
            v, None, q_idx, angles, wscale, wdelta, modes=(False, False),
            post_a=post, post_b=None, out_perm=(1, 2, 0), emit_f32=False,
        )
        return Wv

    def warp_extract(key, v):
        Wv, _ = warp_rigid_pair_traced(
            v, None, q_idx, angles, wscale, wdelta, modes=(False, False),
            post_a=post, post_b=None, out_perm=(1, 2, 0), emit_f32=False,
        )
        dz, dv_tab, du_tab = sc._slice_coef_tables(G, rs, c_ss, z0, gap_vox, NSG)
        s, _ = sc._extract_pair(Wv, None, gap_vox, z0, dz, dv_tab, du_tab, CUBE, NSG)
        return s

    def vcoarse(key, cm):
        return sc._valid_coarse(
            cm, q_idx, angles, wscale, wdelta, G, thr_frac, ns_count, CUBE, NSG, F
        )

    def coarse_warp_only(key, cm):
        delta_c = (wdelta + ((F - 1) / 2.0) * (wscale - 1.0)) / F
        wm, _ = warp_rigid_pair_traced(
            cm, None, q_idx, angles, wscale, delta_c, modes=(False, False)
        )
        return wm

    slices0 = jnp.asarray(rng.random((NSG, CUBE, CUBE), np.float32))
    valid0 = (jnp.arange(NSG) < 80).astype(jnp.float32)

    def sl_art(key, s):
        return sc._slice_artifacts(
            key, s, valid0, gamma, gamma_on, sigma, void_prob, threshold, fast=True
        )

    def full(key, v):
        return sc._acquire_one(
            v, None, q_idx, angles, wscale, wdelta, G, rs, gap_vox, z0, sig,
            thr_frac, ns_count, key, gamma, gamma_on, sigma, void_prob,
            threshold, CUBE, NSG, coarse_mask=cmask,
        )

    timed("warp only (384)", warp_only, vol_p)
    timed("warp + extract (384)", warp_extract, vol_p)
    timed("valid_coarse (96)", vcoarse, cmask)
    timed("coarse warp only (96)", coarse_warp_only, cmask)
    timed("slice artifacts (128x384x384)", sl_art, slices0)
    timed("full acquire (384)", full, vol_p)


if __name__ == "__main__":
    main()
