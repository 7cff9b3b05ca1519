"""Stream-approximation bounds ON CHIP at the production grid tiers.

The CPU suite bounds the stream's two documented approximations — the
coarse-validity z-profile (``scanner._valid_coarse``) and the dz-split
extraction/placement factorization — at toy tiers (64). The production
stream runs them at 384/512/640, exactly where the round-4 compile-OOM bug
lived (commit cb49a03, ``scanner._coarse_mask`` layout note), so these
bounds are asserted here at full 256^3 volume scale on the real tiers
(VERDICT r4 next-round item 9).

Tier routing uses the stream's genparams pinning (``pack_motion``
``resolution_slice`` pin): rs = res_slice/res picks the smallest covering
tier by the ``slice_grid`` law (reference ``simulate_reco.py:349-354``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fetalsyngen_tpu.config import instantiate, load_yaml, resolve_interpolations
from fetalsyngen_tpu.generator.artifacts import batched as ba
from fetalsyngen_tpu.generator.artifacts import scanner as sc

SHAPE = (256, 256, 256)
TIERS = (384, 512, 640)
NSG = 96  # stream's shape-aware slice grid at the default config

from functools import partial


@partial(jax.jit, static_argnames=("cube", "coarse"))
def _acquire_both(vol_p, mask_p, cmask, st, row, key, sp_void, sp_thr,
                  cube, coarse):
    """One-stack acquisition, exact-mask or coarse-validity mode, as ONE
    compiled program per (tier, mode) — eager per-op dispatch through the
    tunneled runtime would pay ~20 ms per op."""
    args = (
        st["q_idx"], st["angles"], st["wscale"], st["wdelta"], st["G"],
        row["rs"], row["gap_vox"], row["z0"], row["sig"],
        st["scal"][0], row["ns"], key,
        st["scal"][1], st["scal"][2] > 0.5, st["scal"][3],
        sp_void, sp_thr, cube, NSG,
    )
    if coarse:
        return sc._acquire_one(vol_p, None, *args, coarse_mask=cmask)
    return sc._acquire_one(vol_p, mask_p, *args)


@partial(jax.jit, static_argnames=("cube", "split"))
def _chain_jit(vol_p, cmask, st, row, sp_void, sp_thr, cube, split):
    slices, valid = sc._acquire_one(
        vol_p, None, st["q_idx"], st["angles"], st["wscale"], st["wdelta"],
        st["G"], row["rs"], row["gap_vox"], row["z0"], row["sig"],
        st["scal"][0], row["ns"], jax.random.PRNGKey(7), st["scal"][1],
        st["scal"][2] > 0.5, st["scal"][3], sp_void, sp_thr, cube, NSG,
        coarse_mask=cmask, split_dz=jnp.float32(1.0) if split else False,
    )
    v, w = sc._recon_one(
        slices, valid, st["Grec"], row["rs"], row["gap_vox"], row["z0"],
        row["sig_rec"], st["qinv"], st["iang"], st["iscl"], st["idlt"],
        cube, NSG, SHAPE, split_dz=jnp.float32(1.0) if split else False,
    )
    return v, w


@pytest.fixture(scope="module")
def sm():
    gen_cfg = resolve_interpolations(load_yaml("configs/dataset/generator/default.yaml"))
    return instantiate(gen_cfg).artifacts["simulate_motion"]


@pytest.fixture(scope="module")
def vols():
    rng = np.random.default_rng(0)
    c = np.linalg.norm(np.indices(SHAPE) - 128.0, axis=0)
    seg = (c < 80).astype(np.int32)
    out = (seg * (60 + 40 * rng.random(SHAPE))).astype(np.float32)
    return jnp.asarray(out), jnp.asarray(seg)


def _pinned_pack(sm, res_slice: float, B: int = 2, seed: int = 0):
    return ba.pack_motion(
        np.random.default_rng(seed), B, SHAPE, 0.5, sm, TIERS, NSG,
        genparams={"resolution_slice": res_slice},
    )


# res_slice pins routing each production tier (rs = pin / 0.5):
# need = ceil(diag/rs/32)*32 with diag = 313.6 -> 352/448/608
TIER_PINS = [(0.45, 384), (0.35, 512), (0.26, 640)]


@pytest.mark.parametrize("pin,cube", TIER_PINS)
def test_coarse_validity_bound_at_tier(sm, vols, pin, cube):
    """Coarse z-profile validity vs the exact warped-mask validity at the
    production tier: at most band-edge flips (diff <= 2), interior flags
    identical — the CPU bound (tests/test_batched_artifacts.py
    ``test_coarse_validity_matches_exact``) holding at production scale."""
    out, seg = vols
    pack = _pinned_pack(sm, pin, B=2, seed=3)
    assert int(pack["tier_idx"][0]) == TIERS.index(cube)
    sp = sm.scanner_args
    vol_p = sc._pad_centered(out, cube)
    mask_p = sc._pad_centered((seg > 0).astype(jnp.float32), cube)
    cmask = sc._coarse_mask(mask_p)
    pack_d = jax.tree.map(jnp.asarray, pack)
    checked = 0
    for b in range(2):
        row = jax.tree.map(lambda a: a[b], pack_d)
        st = {
            k: row[k][0]
            for k in ("q_idx", "angles", "wscale", "wdelta", "G", "scal")
        }
        row_s = {k: row[k] for k in ("rs", "gap_vox", "z0", "sig", "ns")}
        _, v_exact = _acquire_both(
            vol_p, mask_p, cmask, st, row_s, jax.random.PRNGKey(b),
            sp.prob_void, sp.slice_noise_threshold, cube, False,
        )
        _, v_coarse = _acquire_both(
            vol_p, mask_p, cmask, st, row_s, jax.random.PRNGKey(b),
            sp.prob_void, sp.slice_noise_threshold, cube, True,
        )
        ve, vc = np.asarray(v_exact), np.asarray(v_coarse)
        assert ve.sum() > 0, "degenerate stack (no valid slices)"
        diff = int(np.abs(ve - vc).sum())
        assert diff <= 2, (cube, ve, vc)
        if ve.sum() >= 4:
            band = np.where(ve > 0)[0]
            assert np.array_equal(ve[band[1]:band[-1]], vc[band[1]:band[-1]])
        checked += 1
    assert checked == 2


@pytest.mark.parametrize("pin,cube", TIER_PINS)
def test_dz_split_bound_at_tier(sm, vols, pin, cube):
    """At each production tier, on a dz_ok stack: (a) the compiled Mosaic
    kernels must match the XLA fallback on the EXACT engine — this is the
    regression test for the round-5 span-overflow bug (production per-slice
    translation spreads reach ~104 frame units at p95; the old maxspan=48
    clamped taps and corrupted whole blocks, corr 0.896 vs the fallback);
    (b) the dz-split engine stays within its documented first-order bound
    of the exact engine (same 0.99-corr bar as the CPU suite)."""
    out, seg = vols
    sp = sm.scanner_args
    # search a few packs for a dz_ok-proven stack at this tier (~21% of
    # stacks pass the pack-time separation proof at the default config)
    found = None
    for seed in range(8):
        pack = _pinned_pack(sm, pin, B=4, seed=seed)
        ok = np.argwhere(pack["dz_ok"] > 0.5)
        if len(ok):
            found = (pack, int(ok[0, 0]), int(ok[0, 1]))
            break
    if found is None:
        pytest.skip("no dz_ok stack drawn at this tier in 8 packs")
    pack, b, s_idx = found
    pack_d = jax.tree.map(jnp.asarray, pack)
    row = jax.tree.map(lambda a: a[b], pack_d)
    st = {
        k: row[k][s_idx]
        for k in ("q_idx", "angles", "wscale", "wdelta", "G", "Grec", "scal",
                  "qinv", "iang", "iscl", "idlt")
    }
    vol_p = sc._pad_centered(out, cube)
    cmask = sc._coarse_mask(sc._pad_centered((seg > 0).astype(jnp.float32), cube))
    row_s = {k: row[k] for k in ("rs", "gap_vox", "z0", "sig", "sig_rec", "ns")}

    from fetalsyngen_tpu.ops import warp as W

    v0, w0 = _chain_jit(vol_p, cmask, st, row_s, sp.prob_void,
                        sp.slice_noise_threshold, cube, False)
    with W.force_jnp_fallback():
        v0f, w0f = _chain_jit(vol_p, cmask, st, row_s, sp.prob_void,
                              sp.slice_noise_threshold, cube, False)
    v1, w1 = _chain_jit(vol_p, cmask, st, row_s, sp.prob_void,
                        sp.slice_noise_threshold, cube, True)
    m = np.asarray(w0) > 0.1
    assert m.sum() > 1000, "reconstruction footprint unexpectedly small"
    r0 = (np.asarray(v0) / np.maximum(np.asarray(w0), 1e-6))[m]
    rf = (np.asarray(v0f) / np.maximum(np.asarray(w0f), 1e-6))[m]
    r1 = (np.asarray(v1) / np.maximum(np.asarray(w1), 1e-6))[m]
    # (a) Mosaic == fallback on the exact engine (strict: no span clamps
    # may fire on this stack's geometry)
    err_k = np.abs(r0 - rf)
    assert np.quantile(err_k, 0.999) < 0.1, (cube, float(np.quantile(err_k, 0.999)))
    # (b) split vs exact: documented first-order deviation (same-key noise
    # cancels; remaining diff is slab-edge tilt attribution)
    cc = np.corrcoef(r0.ravel(), r1.ravel())[0, 1]
    assert cc > 0.99, (cube, cc)
    assert np.quantile(np.abs(r0 - r1), 0.99) < 15.0, (
        cube, float(np.quantile(np.abs(r0 - r1), 0.99))
    )
