"""Pipeline semantics tests: gates, replay, batching, stage golden checks."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline programs: ~5 min cold compile

import jax
import jax.numpy as jnp

from fetalsyngen_tpu.generator.config import (
    BiasFieldCfg,
    DeformCfg,
    GammaCfg,
    GeneratorCfg,
    IntensityCfg,
    NoiseCfg,
    ResampleCfg,
)
from fetalsyngen_tpu.generator.params import (
    genparams_to_dict,
    overrides_from_genparams,
    sample_params,
)
from fetalsyngen_tpu.generator.pipeline import (
    deformation_coords,
    resample_noise_stage,
    synth_batch,
    synth_sample,
)

from np_reference import gaussian_blur_ref, make_affine_matrix_ref, trilinear_ref, zoom_ref

SHAPE = (48, 48, 48)
LABELS = tuple([0] + list(range(10, 50)))
GEN_CLASSES = tuple([0] + [10] * 10 + [20] * 10 + [30] * 10 + list(range(40, 50)))


def small_cfg(**kw):
    base = dict(
        shape=SHAPE,
        resolution=(0.5, 0.5, 0.5),
        intensity=IntensityCfg(1, 6, LABELS, GEN_CLASSES),
    )
    base.update(kw)
    return GeneratorCfg(**base)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    seeds = jnp.asarray(rng.integers(0, 50, size=SHAPE), jnp.int32)
    seg = jnp.asarray(rng.integers(0, 8, size=SHAPE), jnp.int32)
    return seeds, seg


class TestParams:
    def test_override_forces_gate(self):
        cfg = small_cfg(gamma=GammaCfg(prob=0.0, gamma_std=0.1))
        key = jax.random.PRNGKey(0)
        p = sample_params(key, cfg)
        assert not bool(p.gamma_apply)  # prob 0 -> off
        p2 = sample_params(key, cfg, {"gamma": 1.3})
        assert bool(p2.gamma_apply) and float(p2.gamma) == pytest.approx(1.3)

    def test_class_tying(self):
        cfg = small_cfg()
        p = sample_params(jax.random.PRNGKey(1), cfg)
        mus = np.asarray(p.mus)
        # labels 10..19 tie to class 10: all within 0..225 after clamping
        assert (mus[10:20] >= 0).all() and (mus[10:20] <= 225).all()

    def test_genparams_dict_roundtrip(self):
        cfg = small_cfg()
        p = sample_params(jax.random.PRNGKey(2), cfg)
        d = genparams_to_dict(p)
        ov = overrides_from_genparams(d)
        p2 = sample_params(jax.random.PRNGKey(99), cfg, ov)  # different key!
        np.testing.assert_allclose(np.asarray(p.mus), np.asarray(p2.mus))
        np.testing.assert_allclose(np.asarray(p.rotations), np.asarray(p2.rotations), rtol=1e-6)
        if d["resample_params"]["spacing"] is not None:
            np.testing.assert_allclose(
                np.asarray(p.spacing), np.asarray(p2.spacing), rtol=1e-6
            )


class TestPipeline:
    def test_runs_and_ranges(self, data):
        seeds, seg = data
        out, sg, _, p = synth_sample(jax.random.PRNGKey(0), seeds, seg, cfg=small_cfg())
        out = np.asarray(out)
        assert out.shape == SHAPE
        assert np.isfinite(out).all()
        assert out.min() >= 0
        assert set(np.unique(np.asarray(sg))) <= set(range(8))

    def test_replay_identical(self, data):
        """(key, genparams) -> voxel-identical volume."""
        seeds, seg = data
        key = jax.random.PRNGKey(5)
        cfg = small_cfg()
        out1, sg1, _, p1 = synth_sample(key, seeds, seg, cfg=cfg)
        ov = overrides_from_genparams(genparams_to_dict(p1))
        out2, sg2, _, _ = synth_sample(key, seeds, seg, cfg=cfg, overrides=ov)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(sg1), np.asarray(sg2))

    def test_bf16_production_mode_quality(self, data):
        """The stream/bench bf16 generation mode (precision DEFAULT + bf16
        intermediate storage) vs the f32 contract on the same key: the SEG
        chain must be VOXEL-EXACT (nearest selection is positional; labels
        are bf16-representable integers) and the image must track f32 to
        interpolation-noise level."""
        from fetalsyngen_tpu.ops.linops import precision_scope, storage_scope

        seeds, seg = data
        key = jax.random.PRNGKey(77)
        cfg = small_cfg()
        out_f, sg_f, _, _ = synth_sample(key, seeds, seg, cfg=cfg)
        with precision_scope(jax.lax.Precision.DEFAULT), storage_scope(jnp.bfloat16):
            out_b, sg_b, _, _ = synth_sample(key, seeds, seg, cfg=cfg)
        np.testing.assert_array_equal(np.asarray(sg_b), np.asarray(sg_f))
        a = np.asarray(out_b, np.float32).ravel()
        b = np.asarray(out_f, np.float32).ravel()
        c = np.corrcoef(a, b)[0, 1]
        assert c > 0.995, c
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-6)
        assert rel < 3e-2, rel

    def test_all_gates_off_is_gmm_only(self, data):
        """With every gate forced off, output == raw GMM intensities."""
        seeds, seg = data
        key = jax.random.PRNGKey(7)
        cfg = small_cfg()
        ov = {
            "deform_apply": False,
            "gamma_apply": False,
            "bf_apply": False,
            "resample_apply": False,
            "noise_apply": False,
        }
        out, sg, _, p = synth_sample(key, seeds, seg, cfg=cfg, overrides=ov)
        from fetalsyngen_tpu.generator.pipeline import intensity_stage

        want = intensity_stage(key, seeds, p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(sg), np.asarray(seg))

    def test_deform_changes_seg(self, data):
        seeds, seg = data
        ov = {
            "deform_apply": True,
            "rotations": np.array([0.3, 0.1, -0.2]),
            "gamma_apply": False,
            "bf_apply": False,
            "resample_apply": False,
            "noise_apply": False,
        }
        _, sg, _, _ = synth_sample(jax.random.PRNGKey(8), seeds, seg, cfg=small_cfg(), overrides=ov)
        assert (np.asarray(sg) != np.asarray(seg)).mean() > 0.05

    def test_flip_only(self, data):
        """Pure flip (identity affine, no nonlinear) flips both volumes."""
        seeds, seg = data
        cfg = small_cfg(
            deform=DeformCfg(size=SHAPE, nonlinear_transform=False, margin_shift=False)
        )
        ov = {
            "deform_apply": True,
            "flip": True,
            "rotations": np.zeros(3),
            "shears": np.zeros(3),
            "scalings": np.ones(3),
            "gamma_apply": False,
            "bf_apply": False,
            "resample_apply": False,
            "noise_apply": False,
        }
        key = jax.random.PRNGKey(9)
        out, sg, _, p = synth_sample(key, seeds, seg, cfg=cfg, overrides=ov)
        # identity warp of flipped volume: interior must equal flipped input
        np.testing.assert_array_equal(
            np.asarray(sg)[1:, 1:, 1:], np.asarray(seg)[::-1][1:, 1:, 1:]
        )

    def test_batch_matches_single(self, data):
        seeds, seg = data
        cfg = small_cfg()
        keys = jax.random.split(jax.random.PRNGKey(10), 2)
        ob, sb = synth_batch(keys, jnp.stack([seeds, seeds]), jnp.stack([seg, seg]), cfg)
        o0, s0, _, _ = synth_sample(keys[0], seeds, seg, cfg=cfg)
        o1, s1, _, _ = synth_sample(keys[1], seeds, seg, cfg=cfg)
        np.testing.assert_allclose(np.asarray(ob[0]), np.asarray(o0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ob[1]), np.asarray(o1), rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(sb[0]), np.asarray(s0))


class TestDeformGolden:
    def test_coords_match_reference_math(self):
        """deformation_coords == the reference's deform_image math (no nonlin)."""
        cfg = small_cfg(
            deform=DeformCfg(size=SHAPE, nonlinear_transform=False, margin_shift=True)
        )
        rot = np.array([0.1, -0.2, 0.05])
        sh = np.array([0.01, -0.02, 0.015])
        sc = np.array([1.05, 0.92, 1.1])
        p = sample_params(
            jax.random.PRNGKey(0),
            cfg,
            {"rotations": rot, "shears": sh, "scalings": sc, "deform_apply": True},
        )
        xx2, yy2, zz2 = deformation_coords(jax.random.PRNGKey(0), p, cfg)

        # NumPy golden (affine_nonrigid.py:327-366)
        D, H, W = SHAPE
        xx, yy, zz = np.meshgrid(np.arange(D), np.arange(H), np.arange(W), indexing="ij")
        c = (np.array(SHAPE) - 1) / 2
        xc, yc, zc = xx - c[0], yy - c[1], zz - c[2]
        A = make_affine_matrix_ref(rot, sh, sc)
        c2 = (np.array(SHAPE) - 1) / 2
        gx = A[0, 0] * xc + A[0, 1] * yc + A[0, 2] * zc + c2[0]
        gy = A[1, 0] * xc + A[1, 1] * yc + A[1, 2] * zc + c2[1]
        gz = A[2, 0] * xc + A[2, 1] * yc + A[2, 2] * zc + c2[2]
        for g, dim in ((gx, D), (gy, H), (gz, W)):
            np.clip(g, 0, dim - 1, out=g)
        gx -= np.floor(gx.min())
        gy -= np.floor(gy.min())
        gz -= np.floor(gz.min())
        np.testing.assert_allclose(np.asarray(xx2), gx, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(yy2), gy, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(zz2), gz, rtol=1e-4, atol=1e-3)


class TestResampleGolden:
    def test_fixed_shape_resample_matches_dynamic_reference(self, data):
        """The fixed-shape resample emulation == reference dynamic-shape math.

        Golden path (synthseg.py:50-114 with the augment() ordering):
        blur -> downsample to new_size -> (no noise) -> zoom back -> /max.
        """
        seeds, _ = data
        cfg = small_cfg()
        spacing = np.array([1.2, 1.2, 1.2])
        blur_mult = 1.0
        key = jax.random.PRNGKey(11)
        ov = {
            "resample_apply": True,
            "spacing": spacing,
            "blur_mult": blur_mult,
            "noise_apply": False,
        }
        p = sample_params(key, cfg, ov)
        vol = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(12), SHAPE, jnp.float32, 0, 255)
        )
        got = np.asarray(resample_noise_stage(key, jnp.asarray(vol), p, cfg))

        # --- golden
        in_res = np.array(cfg.resolution)
        stds = blur_mult * np.log(5) / np.pi * spacing / in_res
        stds[spacing <= in_res] = 0.0
        blurred = gaussian_blur_ref(vol, stds)
        new_size = (np.array(SHAPE) * in_res / spacing).astype(int)
        factors = new_size / np.array(SHAPE)
        delta = (1.0 - factors) / (2.0 * factors)
        vs = [
            np.arange(delta[d], delta[d] + new_size[d] / factors[d], 1 / factors[d])[: new_size[d]]
            for d in range(3)
        ]
        II, JJ, KK = np.meshgrid(*vs, indexing="ij")
        down = trilinear_ref(blurred, II, JJ, KK)
        up = zoom_ref(down, 1 / factors)
        want = up / up.max()
        assert want.shape == got.shape
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
