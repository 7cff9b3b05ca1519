"""Traced (stream-path) artifact functions: law parity with the host classes.

The host classes in ``quality.py`` are the replay-faithful reference path;
``batched.py`` re-expresses the same laws with in-program randomness. These
tests check the traced versions produce the same *kind* of change (masking,
local blur, noise injection) and respect their gates.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fetalsyngen_tpu.generator.artifacts import batched as ba
from fetalsyngen_tpu.generator.artifacts.quality import (
    BlurCortex,
    SimulatedBoundaries,
    StructNoise,
    StructNoiseMergeParams,
)
from fetalsyngen_tpu.testing import phantom_seeds_and_seg

SHAPE = (64, 64, 64)


@pytest.fixture(scope="module")
def vols():
    _, seg = phantom_seeds_and_seg(SHAPE, seed=1)
    rng = np.random.default_rng(0)
    out = np.abs(rng.normal(100, 30, SHAPE)).astype(np.float32)
    return jnp.asarray(out), jnp.asarray(seg.astype(np.int32))


class TestTracedMorphology:
    def test_ball_dilate_traced_matches_static(self, vols):
        from fetalsyngen_tpu.ops.morphology import ball_dilate

        _, seg = vols
        mask = (seg > 0).astype(jnp.int32)
        for r in (1, 5, 9):
            got = np.asarray(ba.ball_dilate_traced(mask, jnp.int32(r), ba.MAX_HALO_RADIUS))
            want = np.asarray(ball_dilate(mask, r))
            np.testing.assert_array_equal(got, want)


class TestBlurCortexTraced:
    def test_gate_off_is_identity(self, vols):
        out, seg = vols
        bc = BlurCortex(prob=0.0, cortex_label=2, nblur_min=3, nblur_max=6)
        got = ba.blur_cortex_t(jax.random.PRNGKey(0), out, seg, bc)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(out))

    def test_applies_local_blur(self, vols):
        out, seg = vols
        bc = BlurCortex(prob=1.0, cortex_label=2, nblur_min=20, nblur_max=40)
        got = np.asarray(ba.blur_cortex_t(jax.random.PRNGKey(1), out, seg, bc))
        assert np.isfinite(got).all()
        assert not np.allclose(got, np.asarray(out))
        # blur is LOCAL: most voxels untouched
        changed = np.mean(~np.isclose(got, np.asarray(out), rtol=1e-4))
        assert changed < 0.9


class TestStructNoiseTraced:
    def _sn(self, merge_type):
        mp = StructNoiseMergeParams(
            merge_type=merge_type,
            gauss_nloc_min=3, gauss_nloc_max=8, gauss_sigma_mu=10, gauss_sigma_std=2,
            perlin_res_list=[1, 2], perlin_octaves_list=[1, 2],
            perlin_persistence=0.5, perlin_lacunarity=2, perlin_increase_size=0.1,
        )
        return StructNoise(prob=1.0, wm_label=3, std_min=5, std_max=15, merge_params=mp)

    @pytest.mark.parametrize("merge_type", ["perlin", "gaussian"])
    def test_adds_masked_noise(self, vols, merge_type):
        out, seg = vols
        got = np.asarray(
            ba.struct_noise_t(jax.random.PRNGKey(2), out, seg, self._sn(merge_type))
        )
        assert np.isfinite(got).all()
        # background (seg == 0) untouched
        bg = np.asarray(seg) == 0
        np.testing.assert_allclose(got[bg], np.asarray(out)[bg], rtol=1e-5)
        assert not np.allclose(got[~bg], np.asarray(out)[~bg])

    def test_gate_off_is_identity(self, vols):
        out, seg = vols
        sn = self._sn("perlin")
        sn.prob = 0.0
        got = ba.struct_noise_t(jax.random.PRNGKey(3), out, seg, sn)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(out))


def _tiny_motion(prob=1.0):
    from fetalsyngen_tpu.generator.artifacts import scanner as sc
    from fetalsyngen_tpu.generator.artifacts.quality import ReconMergeParams

    return sc.SimulateMotion(
        prob=prob, tiers=(64,), ns_grid=32,
        scanner_params=sc.ScannerParams(
            1.0, 1.5, 2.0, 1.0, 1.5, 1.0, 1.5, 1, 2, 200, 0, 0.0,
            1, 1, 0.0, 0.0, 0.05, None, False, 0.0,
        ),
        recon_params=sc.ReconParams(
            0.5, 0.1, 0.5, 1.0, 0.5, 0.5, 0.1, 0.4, 0.5,
            ReconMergeParams(
                "perlin", perlin_res_list=[1], perlin_octaves_list=[1],
                perlin_persistence=0.5, perlin_lacunarity=2,
                perlin_increase_size=0.25,
            ),
        ),
    )


@pytest.mark.slow
class TestMotionTraced:
    """The traced motion engine (pack_motion + motion_t) vs basic physics."""

    def test_pack_shapes_and_gates(self, vols):
        sm = _tiny_motion(prob=0.5)
        rng = np.random.default_rng(0)
        pack = ba.pack_motion(rng, 8, SHAPE, 0.5, sm, 64, 32)
        assert pack["G"].shape == (8, 2, 32, 3, 4)
        assert pack["motion_on"].dtype == bool
        # prob 0.5 over 8 draws: both states show up w.h.p.
        assert 0 < pack["motion_on"].sum() < 8

    def test_motion_on_degrades_but_correlates(self, vols):
        from scipy.ndimage import gaussian_filter

        _, seg = vols
        segn = np.asarray(seg)
        out = gaussian_filter(
            (segn > 0).astype(np.float32) * 100 + (segn > 2) * 80, 1.5
        ).astype(np.float32)
        sm = _tiny_motion(prob=1.0)
        rng = np.random.default_rng(1)
        pack = jax.tree.map(
            jnp.asarray, ba.pack_motion(rng, 2, SHAPE, 0.5, sm, 64, 32)
        )
        outj = jnp.asarray(out)

        def one(args):
            k, row = args
            return ba.motion_t(k, outj, seg, row, sm, SHAPE, 64, 32)

        got = np.asarray(
            jax.lax.map(one, (jax.random.split(jax.random.PRNGKey(0), 2), pack))
        )
        assert np.isfinite(got).all()
        for i in range(2):
            assert not np.allclose(got[i], out)
            c = np.corrcoef(
                got[i][8:56, 8:56, 8:56].ravel(), out[8:56, 8:56, 8:56].ravel()
            )[0, 1]
            assert c > 0.4, c

    def test_coarse_validity_matches_exact(self, vols):
        """_valid_coarse (stream fast mode) vs the exact mask-mass validity:
        flags agree except possibly band-edge slices near the threshold."""
        from fetalsyngen_tpu.generator.artifacts import scanner as sc

        out, seg = vols
        sm = _tiny_motion(prob=1.0)
        cube, nsg = 64, 32
        rng = np.random.default_rng(4)
        pack = jax.tree.map(
            jnp.asarray, ba.pack_motion(rng, 2, SHAPE, 0.5, sm, cube, nsg)
        )
        vol_p = sc._pad_centered(out.astype(jnp.float32), cube)
        mask_p = sc._pad_centered((seg > 0).astype(jnp.float32), cube)
        cmask = sc._coarse_mask(mask_p)
        sp = sm.scanner_args
        for b in range(2):
            row = jax.tree.map(lambda a: a[b], pack)
            st = {
                k: row[k][0]
                for k in ("q_idx", "angles", "wscale", "wdelta", "G", "scal")
            }  # first attempt stack
            args = (
                st["q_idx"], st["angles"], st["wscale"], st["wdelta"], st["G"],
                row["rs"], row["gap_vox"], row["z0"], row["sig"],
                st["scal"][0], row["ns"], jax.random.PRNGKey(b),
                st["scal"][1], st["scal"][2] > 0.5, st["scal"][3],
                sp.prob_void, sp.slice_noise_threshold, cube, nsg,
            )
            _, v_exact = sc._acquire_one(vol_p, mask_p, *args)
            _, v_coarse = sc._acquire_one(vol_p, None, *args, coarse_mask=cmask)
            ve, vc = np.asarray(v_exact), np.asarray(v_coarse)
            diff = int(np.abs(ve - vc).sum())
            assert diff <= 2, (ve, vc)  # only band-edge slices may flip
            if ve.sum() >= 4:  # interior flags identical
                band = np.where(ve > 0)[0]
                assert np.array_equal(ve[band[1]:band[-1]], vc[band[1]:band[-1]])

    def test_recon_one_ns_grid_pad_equivalence(self):
        """A 32-granular slice grid must reconstruct identically to the same
        stack padded onto a 128 grid: _recon_one pads the one lanes-on-slice-
        axis pass internally, and padded lanes (zero value, zero keep) are
        exactly what the bigger grid holds beyond ns."""
        from fetalsyngen_tpu.generator.artifacts import scanner as sc

        cube, out_shape = 64, (48, 48, 48)
        ns_small, ns_big = 32, 128
        rng = np.random.default_rng(7)
        ns = 20  # real slices
        slices_s = np.zeros((ns_small, cube, cube), np.float32)
        slices_s[:ns] = rng.random((ns, cube, cube), np.float32) * 100
        keep_s = (np.arange(ns_small) < ns).astype(np.float32)
        G = np.zeros((ns_small, 3, 4), np.float32)
        G[:, 0, 1] = rng.normal(0, 0.01, ns_small)
        G[:, 0, 2] = rng.normal(0, 0.01, ns_small)
        G[:, 0, 3] = 10.0 + 2.2 * np.arange(ns_small) + rng.normal(0, 0.5, ns_small)
        G[:, 1, 3] = rng.normal(0, 1.0, ns_small)
        G[:, 2, 3] = rng.normal(0, 1.0, ns_small)
        # pad the same stack onto the big grid
        pad = ns_big - ns_small
        slices_b = np.pad(slices_s, ((0, pad), (0, 0), (0, 0)))
        keep_b = np.pad(keep_s, (0, pad))
        G_b = np.pad(G, ((0, pad), (0, 0), (0, 0)))
        G_b[ns_small:, 0, 3] = 10.0 + 2.2 * np.arange(ns_small, ns_big)

        args = (
            jnp.float32(1.3), jnp.float32(2.2), jnp.float32(10.0),
            jnp.asarray([1.2, 0.8], jnp.float32), jnp.int32(2),
            jnp.asarray([0.05, -0.03, 0.08], jnp.float32), jnp.float32(1.0),
            jnp.asarray([8.0, 8.5, 7.5], jnp.float32),
        )
        v_s, w_s = sc._recon_one(
            jnp.asarray(slices_s), jnp.asarray(keep_s), jnp.asarray(G),
            *args, cube, ns_small, out_shape,
        )
        v_b, w_b = sc._recon_one(
            jnp.asarray(slices_b), jnp.asarray(keep_b), jnp.asarray(G_b),
            *args, cube, ns_big, out_shape,
        )
        np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_b), atol=2e-3)
        np.testing.assert_allclose(np.asarray(w_s), np.asarray(w_b), atol=1e-5)

    def test_extract_pair_dz_split_vs_dense_reference(self):
        """Engaged dz-split extraction (static flag 1) vs a dense per-slice
        gather reference, on separated geometry: the split must be at least
        as accurate as the exact factorization (at plane centers it
        degenerates to ONE interpolation), and flag 0 must reproduce the
        exact tables through the same blended program."""
        from scipy.ndimage import gaussian_filter

        from fetalsyngen_tpu.generator.artifacts import scanner as sc

        cube, nsg = 64, 16
        rng = np.random.default_rng(0)
        vol = gaussian_filter(
            np.clip(rng.normal(50, 20, (cube,) * 3), 0, None).astype(np.float32), 2.0
        )
        gap, rs = 4.0, 1.0
        z0 = (cube - 1) / 2 - (nsg - 1) / 2 * gap
        c_ss = (cube - 1) / 2
        t = rng.uniform(-1.5, 1.5, nsg).astype(np.float32)
        a1 = rng.uniform(-0.05, 0.05, nsg).astype(np.float32)
        a2 = rng.uniform(-0.05, 0.05, nsg).astype(np.float32)
        G = np.zeros((nsg, 3, 4), np.float32)
        G[:, 0, 1], G[:, 0, 2] = a1, a2
        G[:, 0, 3] = z0 + gap * np.arange(nsg) + t
        dz, dv, du = sc._slice_coef_tables(jnp.asarray(G), rs, c_ss, z0, gap, nsg)
        # identity in-plane passes isolate the z extraction
        ident = np.zeros((nsg, 4), np.float32)
        ident[:, 2] = 1.0
        dvi = jnp.asarray(ident)
        x = jnp.asarray(vol)  # treated as the (v, u, z) stack frame
        outs = {}
        for name, flag in (
            ("exact", False), ("off", jnp.float32(0.0)), ("on", jnp.float32(1.0)),
        ):
            s, _ = sc._extract_pair(
                x, None, gap, z0, dz, dvi, dvi, cube, nsg, split_dz=flag
            )
            outs[name] = np.asarray(s)
        # flag 0 through the blended program == the static exact path
        np.testing.assert_allclose(outs["off"], outs["exact"], atol=1e-5)
        # dense reference: out[n, v, u] = V[v, u, z0 + gap n + dz(n, v, u)]
        vv = np.arange(cube, dtype=np.float32)
        ref = np.zeros((nsg, cube, cube), np.float32)
        for n in range(nsg):
            pz = (
                z0 + gap * n + t[n]
                + a1[n] * rs * (vv[:, None] - c_ss)
                + a2[n] * rs * (vv[None, :] - c_ss)
            )
            pz = np.clip(pz, 0, cube - 1)
            f = np.clip(np.floor(pz).astype(int), 0, cube - 2)
            w = pz - f
            ref[n] = (1 - w) * np.take_along_axis(vol, f[..., None], 2)[..., 0] + (
                w
            ) * np.take_along_axis(vol, (f + 1)[..., None], 2)[..., 0]
        err_exact = np.abs(outs["exact"] - ref).max()
        err_split = np.abs(outs["on"] - ref).max()
        assert err_split <= err_exact + 1e-4, (err_split, err_exact)
        assert err_split < 0.02 * ref.max(), err_split

    def test_recon_one_dz_split_placement_semantics(self):
        """A delta slice with a translated plane: the engaged split PLACES
        its content at the actual plane z = Grec[m,0,3] (the reference
        adjoint's scatter semantics, ``simulate_reco.py:38-54``); the exact
        engine's first-order inverse GATHER resamples slot content instead,
        so the delta's mass stays at the nominal base_z. Both agree for
        slice-independent drift; the per-stack gate (``_dz_split_ok``)
        bounds the jitter where they differ."""
        from fetalsyngen_tpu.generator.artifacts import scanner as sc

        cube, nsg = 64, 16
        gap, t_m, m = 4.0, 1.2, 7
        z0 = (cube - 1) / 2 - (nsg - 1) / 2 * gap
        G = np.zeros((nsg, 3, 4), np.float32)
        G[:, 0, 3] = z0 + gap * np.arange(nsg)
        G[m, 0, 3] += t_m
        slices = np.zeros((nsg, cube, cube), np.float32)
        slices[m] = 1.0
        keep = np.ones(nsg, np.float32)
        args = (
            jnp.float32(1.0), jnp.float32(gap), jnp.float32(z0),
            jnp.asarray([0.2, 0.2], jnp.float32),  # near-delta recon PSF
            jnp.int32(0), jnp.zeros(3, jnp.float32), jnp.float32(1.0),
            jnp.zeros(3, jnp.float32),
        )

        def com(flag):
            v, _ = sc._recon_one(
                jnp.asarray(slices), jnp.asarray(keep), jnp.asarray(G),
                *args, cube, nsg, (cube,) * 3, split_dz=flag,
            )
            prof = np.asarray(v)[:, cube // 2, cube // 2]
            return float((prof * np.arange(cube)).sum() / prof.sum())

        base = z0 + gap * m
        assert abs(com(jnp.float32(1.0)) - (base + t_m)) < 0.15  # scatter
        assert abs(com(False) - base) < 0.15  # first-order inverse gather
        # flag 0 through the blended program == the static exact path
        assert abs(com(jnp.float32(0.0)) - com(False)) < 1e-4

    def test_storage_scope_bf16_close_to_f32(self, vols):
        """The stream's bf16 intermediate-storage mode (linops.storage_scope)
        must track the f32 chain to interpolation-noise level: same keys ->
        same draws, so ALL disagreement is bf16 rounding in the matmul
        segments."""
        from scipy.ndimage import gaussian_filter

        from fetalsyngen_tpu.ops.linops import precision_scope, storage_scope

        _, seg = vols
        segn = np.asarray(seg)
        out = jnp.asarray(
            gaussian_filter(
                (segn > 0).astype(np.float32) * 100 + (segn > 2) * 80, 1.5
            ).astype(np.float32)
        )
        sm = _tiny_motion(prob=1.0)
        pack = jax.tree.map(
            jnp.asarray,
            ba.pack_motion(np.random.default_rng(7), 1, SHAPE, 0.5, sm, 64, 32),
        )
        row = jax.tree.map(lambda a: a[0], pack)
        k = jax.random.PRNGKey(9)
        ref = np.asarray(ba.motion_t(k, out, seg, row, sm, SHAPE, 64, 32))
        with precision_scope(jax.lax.Precision.DEFAULT), storage_scope(jnp.bfloat16):
            got = np.asarray(ba.motion_t(k, out, seg, row, sm, SHAPE, 64, 32))
        assert got.dtype == np.float32  # boundaries stay f32
        denom = np.linalg.norm(ref) + 1e-6
        rel = np.linalg.norm(got - ref) / denom
        assert rel < 2e-2, rel
        c = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
        assert c > 0.999, c

    def test_small_frame_matches_big(self, vols):
        """The small px-frame engine (pack small_cube + motion_t small branch)
        must produce the same scan as the big voxel-frame engine for an
        eligible sample: identical host draws (packing is draw-for-draw the
        same), slice noise/gamma/voids off in the tiny config, so all
        disagreement is interpolation order + band-edge validity."""
        from scipy.ndimage import gaussian_filter

        _, seg = vols
        segn = np.asarray(seg)
        out = jnp.asarray(
            gaussian_filter(
                (segn > 0).astype(np.float32) * 100 + (segn > 2) * 80, 1.5
            ).astype(np.float32)
        )
        sm = _tiny_motion(prob=1.0)
        B, cube, small, nsg = 6, 96, 64, 32
        pack_b = ba.pack_motion(np.random.default_rng(11), B, SHAPE, 0.5, sm, cube, nsg)
        pack_s = ba.pack_motion(
            np.random.default_rng(11), B, SHAPE, 0.5, sm, cube, nsg, small_cube=small
        )
        assert not pack_b["small"].any()
        assert pack_s["small"].any() and not pack_s["small"].all()
        # identical host draw sequence: big-mode rows agree across packs
        big_rows = ~pack_s["small"]
        np.testing.assert_allclose(
            pack_s["gap_vox"][big_rows], pack_b["gap_vox"][big_rows], rtol=1e-6
        )
        i = int(np.argmax(pack_s["small"]))
        k = jax.random.PRNGKey(21)
        row_b = jax.tree.map(lambda a: jnp.asarray(a[i]), pack_b)
        row_s = jax.tree.map(lambda a: jnp.asarray(a[i]), pack_s)
        got_b = np.asarray(ba.motion_t(k, out, seg, row_b, sm, SHAPE, cube, nsg))
        got_s = np.asarray(
            ba.motion_t(k, out, seg, row_s, sm, SHAPE, cube, nsg, small_cube=small)
        )
        ref = np.asarray(out)
        assert np.isfinite(got_s).all()
        assert not np.allclose(got_s, ref)  # motion actually ran
        c = np.corrcoef(got_s.ravel(), got_b.ravel())[0, 1]
        assert c > 0.98, c

    def test_coarse_weight_matches_exact_engine(self, vols):
        """The coarse recon-weight chain (``scanner._recon_one``
        ``coarse_inv``: weight on f-pooled stack / 2-pooled recon grids,
        bilinear upsample) vs the exact full-resolution weight. The weight
        is geometry-only and smooth except at slab edges, so the error is a
        thin band at each stack's slab boundary, diluted by multi-stack
        accumulation — same acceptance bar as the small-frame (0.98) and
        dz-split (0.99) stream approximations."""
        from scipy.ndimage import gaussian_filter

        _, seg = vols
        segn = np.asarray(seg)
        out = jnp.asarray(
            gaussian_filter(
                (segn > 0).astype(np.float32) * 100 + (segn > 2) * 80, 1.5
            ).astype(np.float32)
        )
        sm = _tiny_motion(prob=1.0)
        cube, nsg = 256, 32  # 256 pools by f=2 (the smallest real factor)
        pack = jax.tree.map(
            jnp.asarray,
            ba.pack_motion(np.random.default_rng(7), 2, SHAPE, 0.5, sm, cube, nsg),
        )
        for b in range(2):
            row = jax.tree.map(lambda a: a[b], pack)
            exact = np.asarray(
                ba.motion_t(
                    jax.random.PRNGKey(5), out, seg, row, sm, SHAPE, cube, nsg,
                    coarse_w=False,
                )
            )
            coarse = np.asarray(
                ba.motion_t(
                    jax.random.PRNGKey(5), out, seg, row, sm, SHAPE, cube, nsg,
                    coarse_w=True,
                )
            )
            assert np.isfinite(coarse).all()
            assert not np.allclose(exact, np.asarray(out))  # motion ran
            c = np.corrcoef(exact.ravel(), coarse.ravel())[0, 1]
            assert c > 0.99, (b, c)
            # the median voxel is untouched (error is slab-edge bands only)
            assert np.percentile(np.abs(exact - coarse), 50) < 0.5

    def test_dz_split_matches_exact_engine(self, vols):
        """The dz-split engine (per-slice z translation folded into the
        extraction/placement matmuls, tilt-only hat passes —
        ``scanner._extract_pair``/``_recon_one`` ``split_dz``) gates PER
        STACK on a pack-time separation proof (``batched._dz_split_ok``):
        gated-off stacks reproduce the exact tables through the blended
        program, engaged stacks are attribution-exact by construction —
        outputs agree tightly either way (not bitwise: the split samples
        each plane center with ONE interpolation where the exact path
        composes hat+matmul)."""
        from scipy.ndimage import gaussian_filter

        _, seg = vols
        segn = np.asarray(seg)
        out = jnp.asarray(
            gaussian_filter(
                (segn > 0).astype(np.float32) * 100 + (segn > 2) * 80, 1.5
            ).astype(np.float32)
        )
        sm = _tiny_motion(prob=1.0)
        B, cube, nsg = 4, 64, 32
        pack = jax.tree.map(
            jnp.asarray,
            ba.pack_motion(np.random.default_rng(7), B, SHAPE, 0.5, sm, cube, nsg),
        )
        keys = jax.random.split(jax.random.PRNGKey(5), B)

        def run(split):
            def one(args):
                k, row = args
                return ba.motion_t(
                    k, out, seg, row, sm, SHAPE, cube, nsg, split_dz=split
                )

            return np.asarray(jax.lax.map(one, (keys, pack)))

        exact = run(False)
        split = run(True)
        ref = np.asarray(out)
        assert np.isfinite(split).all()
        for i in range(B):
            assert not np.allclose(split[i], ref)  # motion actually ran
            c = np.corrcoef(split[i].ravel(), exact[i].ravel())[0, 1]
            assert c > 0.99, (i, c)

    def test_dz_split_flag_engages_on_separated_stacks(self):
        """_dz_split_ok: separated plane positions -> 1.0; crossing -> 0.0."""
        nsg = 16
        G = np.zeros((nsg, 3, 4), np.float32)
        G[:, 0, 3] = 10.0 + 4.0 * np.arange(nsg)  # separated by 4 > 2.05
        assert ba._dz_split_ok(G, G, nsg, gap_u=4.0) == 1.0
        Gx = G.copy()
        Gx[3, 0, 3] = Gx[4, 0, 3] - 0.5  # two planes cross
        assert ba._dz_split_ok(Gx, G, nsg, gap_u=4.0) == 0.0
        assert ba._dz_split_ok(G, Gx, nsg, gap_u=4.0) == 0.0
        assert ba._dz_split_ok(G, G, nsg, gap_u=1.5) == 0.0  # gap too small

    def test_motion_off_is_identity(self, vols):
        out, seg = vols
        sm = _tiny_motion(prob=0.0)
        pack = jax.tree.map(
            jnp.asarray,
            ba.pack_motion(np.random.default_rng(2), 1, SHAPE, 0.5, sm, 64, 32),
        )
        row = jax.tree.map(lambda a: a[0], pack)
        got = ba.motion_t(jax.random.PRNGKey(3), out, seg, row, sm, SHAPE, 64, 32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(out))


@pytest.mark.slow
class TestArtifactStream:
    """SR artifacts on the production stream path (VERDICT round-2 item 2)."""

    def test_stream_applies_artifacts(self, tmp_path_factory):
        import sys

        sys.path.insert(0, "tests")
        from fixtures import build_bids_tree, SHAPE as DSHAPE
        from test_datasets import small_generator
        from fetalsyngen_tpu.data.datasets import FetalSynthDataset
        from fetalsyngen_tpu.parallel.input_pipeline import SyntheticStream

        root = build_bids_tree(tmp_path_factory.mktemp("bids_art"))
        gen = small_generator()
        gen.artifacts["simulate_motion"] = _tiny_motion(prob=1.0)
        gen.artifacts["blur_cortex"] = BlurCortex(
            prob=1.0, cortex_label=2, nblur_min=3, nblur_max=6
        )
        ds = FetalSynthDataset(str(root), gen, str(root / "derivatives" / "seeds"))
        stream = SyntheticStream(ds, batch_size=2, seed=0, prefetch=False)
        assert stream.cube == 64 and stream.ns_grid == 32
        batch = next(iter(stream))
        img = np.asarray(batch["image"])
        assert img.shape == (2, *DSHAPE)
        assert np.isfinite(img).all() and img.min() >= 0.0 and img.max() <= 1.0

        # artifact-free stream from the same seed differs (the chain ran)
        gen2 = small_generator()
        ds2 = FetalSynthDataset(str(root), gen2, str(root / "derivatives" / "seeds"))
        stream2 = SyntheticStream(ds2, batch_size=2, seed=0, prefetch=False)
        img2 = np.asarray(next(iter(stream2))["image"])
        assert not np.allclose(img, img2)


class TestStreamGenparamsPins:
    """Stream genparams convergence (VERDICT r4 missing #4 / next-round #8):
    the batched stream honors resolution_slice / slice_thickness / gap and
    artifact-gate pins from a genparams dict (reference contract:
    ``docs/datasets.md`` "Fixed Image Generation"; host-path pin law
    ``scanner.py`` ``Scanner.get_resolution``)."""

    GP = {"resolution_slice": 0.7, "slice_thickness": 1.2, "gap": 1.25}

    def test_pack_motion_pins_and_forces_gate(self):
        sm = _tiny_motion(prob=0.0)  # gate never fires unpinned
        pack = ba.pack_motion(
            np.random.default_rng(0), 4, SHAPE, 0.5, sm, 64, 32,
            genparams=self.GP, with_record=True,
        )
        rec = pack.pop("_record")
        assert rec["motion_on"].all()  # non-empty genparams forces the gate
        np.testing.assert_allclose(rec["resolution_slice"], 0.7)
        np.testing.assert_allclose(rec["slice_thickness"], 1.2)
        np.testing.assert_allclose(rec["gap"], 1.25)
        assert pack["motion_on"].all()
        np.testing.assert_allclose(pack["rs"], 0.7 / 0.5, rtol=1e-6)

    def test_pins_keep_host_draw_order(self):
        # draw-then-override: pinned and unpinned packs consume the SAME
        # host RNG values, so pins never shift any other sample's draws
        r1, r2 = np.random.default_rng(7), np.random.default_rng(7)
        ba.pack_motion(r1, 2, SHAPE, 0.5, _tiny_motion(1.0), 64, 32)
        ba.pack_motion(r2, 2, SHAPE, 0.5, _tiny_motion(1.0), 64, 32, genparams=self.GP)
        assert r1.integers(2**31) == r2.integers(2**31)

    def test_apply_false_forces_motion_off(self):
        pack = ba.pack_motion(
            np.random.default_rng(0), 4, SHAPE, 0.5, _tiny_motion(1.0), 64, 32,
            genparams={"apply": False}, with_record=True,
        )
        assert not pack["_record"]["motion_on"].any()
        assert not pack["motion_on"].any()

    def test_traced_gate_pins(self, vols):
        out, seg = vols
        bc = BlurCortex(prob=0.0, cortex_label=2, nblur_min=3, nblur_max=6)
        on = ba.blur_cortex_t(jax.random.PRNGKey(1), out, seg, bc, gate=jnp.int32(1))
        assert not np.allclose(np.asarray(on), np.asarray(out))  # forced ON
        bc.prob = 1.0
        off = ba.blur_cortex_t(jax.random.PRNGKey(1), out, seg, bc, gate=jnp.int32(0))
        np.testing.assert_array_equal(np.asarray(off), np.asarray(out))  # forced OFF
        drawn = ba.blur_cortex_t(jax.random.PRNGKey(1), out, seg, bc, gate=jnp.int32(-1))
        assert not np.allclose(np.asarray(drawn), np.asarray(out))  # -1 keeps draw

    def test_stream_honors_pins_in_meta(self, tmp_path_factory):
        import sys

        sys.path.insert(0, "tests")
        from fixtures import build_bids_tree
        from test_datasets import small_generator
        from fetalsyngen_tpu.data.datasets import FetalSynthDataset
        from fetalsyngen_tpu.parallel.input_pipeline import SyntheticStream

        root = build_bids_tree(tmp_path_factory.mktemp("bids_pins"))
        gen = small_generator()
        gen.artifacts["simulate_motion"] = _tiny_motion(prob=0.0)
        gen.artifacts["blur_cortex"] = BlurCortex(
            prob=0.0, cortex_label=2, nblur_min=3, nblur_max=6
        )
        ds = FetalSynthDataset(str(root), gen, str(root / "derivatives" / "seeds"))
        pins = {
            "artifact_params": {
                "simulate_motion": dict(self.GP),
                "blur_cortex": {"apply": True},
            }
        }
        stream = SyntheticStream(
            ds, batch_size=2, seed=0, prefetch=False, genparams=pins
        )
        batch = next(iter(stream))
        rec = batch["meta"]["scanner"]
        assert rec["motion_on"].all()
        np.testing.assert_allclose(rec["resolution_slice"], 0.7)
        np.testing.assert_allclose(rec["slice_thickness"], 1.2)
        np.testing.assert_allclose(rec["gap"], 1.25)
        np.testing.assert_array_equal(
            batch["meta"]["pack"]["gates"], np.tile([1, -1, -1], (2, 1))
        )
        img = np.asarray(batch["image"])
        assert np.isfinite(img).all()
        # the meta replay contract survives pinning (voxel-exact)
        rb = stream.replay_batch(batch["meta"])
        np.testing.assert_array_equal(np.asarray(rb["image"]), img)


class TestBoundariesTraced:
    def test_plain_masking(self, vols):
        out, seg = vols
        sb = SimulatedBoundaries(0.0, 0.0, 0.0)
        got = np.asarray(ba.boundaries_t(jax.random.PRNGKey(4), out, seg, sb))
        assert got[0, 0, 0] == 0.0
        inner = np.asarray(seg) > 0
        np.testing.assert_allclose(got[inner], np.asarray(out)[inner], rtol=1e-6)

    def test_no_mask_passthrough(self, vols):
        out, seg = vols
        sb = SimulatedBoundaries(1.0, 0.0, 0.0)
        got = ba.boundaries_t(jax.random.PRNGKey(5), out, seg, sb)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(out))

    def test_halo_grows_mask(self, vols):
        out, seg = vols
        sb = SimulatedBoundaries(0.0, 1.0, 0.0)
        got = np.asarray(ba.boundaries_t(jax.random.PRNGKey(6), out, seg, sb))
        kept = got != 0
        inner = np.asarray(seg) > 0
        assert kept.sum() > inner.sum()  # halo extends beyond the seg mask

    def test_fuzzy_runs(self, vols):
        out, seg = vols
        sb = SimulatedBoundaries(0.0, 0.0, 1.0)
        got = np.asarray(ba.boundaries_t(jax.random.PRNGKey(7), out, seg, sb))
        assert np.isfinite(got).all()
        inner = np.asarray(seg) > 0
        np.testing.assert_allclose(got[inner], np.asarray(out)[inner], rtol=1e-6)


@pytest.mark.slow
class TestMultiTier:
    """VERDICT r3 missing #4: the stream serves the FULL res_slice law via
    per-sample static tiers (lax.switch) instead of clamping draws that need
    a grid above the single tier (reference law simulate_reco.py:142-191,
    349-354; host-path tier law scanner.slice_grid)."""

    def test_pack_spans_tiers_and_matches_host_tier_law(self, vols):
        from fetalsyngen_tpu.generator.artifacts.scanner import slice_grid

        sm = _tiny_motion(prob=1.0)
        sm.tiers = (64, 96)
        rng = np.random.default_rng(3)
        pack = ba.pack_motion(rng, 16, SHAPE, 0.5, sm, (64, 96), 32)
        rs, ti = pack["rs"], pack["tier_idx"]
        diag = np.sqrt(sum(s * s for s in SHAPE) / 2.0)
        # law floor is rs = fac_min = 1.0; a single 64 tier would clamp every
        # draw below diag/64 ~ 1.225 — multi-tier serves them unclamped
        assert rs.min() < diag / 64 - 0.05
        assert (ti == 0).any() and (ti == 1).any()
        # per-sample tier == the host path's slice_grid law
        for r, t in zip(rs, ti):
            assert (64, 96)[int(t)] == slice_grid(SHAPE, float(r), None, (64, 96))

    def test_multi_tier_engine_matches_single_tier_branch(self, vols):
        """A sample routed through the lax.switch == the same row run on a
        dedicated single-tier engine (same program, same inputs)."""
        from scipy.ndimage import gaussian_filter

        _, seg = vols
        segn = np.asarray(seg)
        out = gaussian_filter(
            (segn > 0).astype(np.float32) * 100 + (segn > 2) * 80, 1.5
        ).astype(np.float32)
        outj = jnp.asarray(out)
        sm = _tiny_motion(prob=1.0)
        sm.tiers = (64, 96)
        rng = np.random.default_rng(5)
        pack = ba.pack_motion(rng, 8, SHAPE, 0.5, sm, (64, 96), 32)
        ti = pack["tier_idx"]
        assert (ti == 1).any(), "need at least one big-tier draw"
        packj = jax.tree.map(jnp.asarray, pack)
        for b in (int(np.argmax(ti == 0)), int(np.argmax(ti == 1))):
            row = jax.tree.map(lambda a: a[b], packj)
            k = jax.random.PRNGKey(50 + b)
            got = np.asarray(ba.motion_t(k, outj, seg, row, sm, SHAPE, (64, 96), 32))
            single = np.asarray(
                ba.motion_t(k, outj, seg, row, sm, SHAPE, int((64, 96)[ti[b]]), 32)
            )
            np.testing.assert_array_equal(got, single)
            assert np.isfinite(got).all()
            assert not np.allclose(got, out)
            c = np.corrcoef(
                got[8:56, 8:56, 8:56].ravel(), out[8:56, 8:56, 8:56].ravel()
            )[0, 1]
            assert c > 0.4, c
