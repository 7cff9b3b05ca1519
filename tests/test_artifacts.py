"""Artifact engine tests: transforms algebra, noise fields, morphology, scanner."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import fetalsyngen_tpu.generator.artifacts.scanner as sc
from fetalsyngen_tpu.generator.artifacts.motion import sample_motion
from fetalsyngen_tpu.generator.artifacts.psf import get_psf, resolution2sigma
from fetalsyngen_tpu.generator.artifacts.quality import (
    BlurCortex,
    ReconMergeParams,
    SimulatedBoundaries,
    StructNoise,
    StructNoiseMergeParams,
    masked_random_centers,
)
from fetalsyngen_tpu.generator.artifacts.transforms import (
    RigidTransform,
    axisangle2mat,
    interleave_index,
    mat2axisangle,
    random_init_stack_transforms,
    reset_transform,
)
from fetalsyngen_tpu.ops.morphology import ball_dilate, box_sum, dilate, erode
from fetalsyngen_tpu.ops.noise import fractal_noise_3d, mog_3d, perlin_noise_3d

RNG = np.random.default_rng(0)


class TestTransforms:
    def test_axisangle_roundtrip(self):
        ax = np.concatenate([RNG.normal(0, 1, (10, 3)), RNG.normal(0, 5, (10, 3))], -1).astype(
            np.float32
        )
        back = mat2axisangle(axisangle2mat(ax))
        np.testing.assert_allclose(back, ax, rtol=1e-4, atol=1e-4)

    def test_compose_inv_identity(self):
        ax = np.concatenate([RNG.normal(0, 1, (5, 3)), RNG.normal(0, 5, (5, 3))], -1).astype(
            np.float32
        )
        t = RigidTransform(ax)
        ident = t.compose(t.inv()).matrix()
        for m in ident:
            np.testing.assert_allclose(m[:, :3], np.eye(3), atol=1e-5)
            np.testing.assert_allclose(m[:, 3], 0, atol=1e-4)

    def test_compose_matches_reference_convention(self):
        """trans-first composition: x -> R1 R2 (x + t2 + R2^T t1)."""
        a = RigidTransform(np.array([[0.1, 0.2, -0.1, 1.0, 2.0, 3.0]], np.float32))
        b = RigidTransform(np.array([[-0.2, 0.05, 0.3, -1.0, 0.5, 2.0]], np.float32))
        x = RNG.normal(0, 10, (1, 3)).astype(np.float32)
        m_ab = a.compose(b).matrix()[0]
        ma, mb = a.matrix()[0], b.matrix()[0]
        # apply b then a: y = Ra ((Rb (x + tb)) + ta)
        y1 = ma[:, :3] @ (mb[:, :3] @ (x[0] + mb[:, 3]) + ma[:, 3])
        y2 = m_ab[:, :3] @ (x[0] + m_ab[:, 3])
        np.testing.assert_allclose(y1, y2, rtol=1e-4, atol=1e-4)

    def test_stack_transforms(self):
        rng = np.random.default_rng(3)
        t = random_init_stack_transforms(10, 2.0, False, 3.0, rng)
        ax = t.axisangle()
        assert ax.shape == (10, 6)
        np.testing.assert_allclose(np.diff(ax[:, 5]), 2.0, atol=1e-5)  # gap spacing
        r = reset_transform(t)
        assert np.allclose(r.axisangle()[:, :5], 0)

    def test_interleave(self):
        assert interleave_index(6, 2) == [0, 3, 1, 4, 2, 5]

    def test_motion_trajectories(self):
        rng = np.random.default_rng(1)
        ts = np.arange(20) * 1.5
        m = sample_motion(ts, rng)
        mats = m.matrix()
        assert mats.shape == (20, 3, 4)
        # first time point is the identity (re-referenced)
        np.testing.assert_allclose(mats[0, :, :3], np.eye(3), atol=1e-5)
        np.testing.assert_allclose(mats[0, :, 3], 0, atol=1e-5)
        # rotations are valid (orthonormal)
        for m3 in mats[:5, :, :3]:
            np.testing.assert_allclose(m3 @ m3.T, np.eye(3), atol=1e-4)


class TestPSF:
    def test_psf_matches_reference_shape_rules(self):
        psf = get_psf(res_ratio=(1.5, 1.5, 3.0))
        assert psf.ndim == 3
        np.testing.assert_allclose(psf.sum(), 1.0, rtol=1e-5)
        # symmetric, centered peak
        assert psf[tuple(s // 2 for s in psf.shape)] == psf.max()

    def test_sigma_constants(self):
        sx, sy, sz = resolution2sigma((1.0, 1.0, 3.0))
        assert sz == pytest.approx(3.0 / (2 * np.sqrt(2 * np.log(2))))
        assert sx == pytest.approx(1.2067091288 * 1.0 / (2 * np.sqrt(2 * np.log(2))))


class TestNoise:
    def test_perlin_shape_range(self):
        n = np.asarray(perlin_noise_3d(jax.random.PRNGKey(0), (32, 32, 32), (2, 2, 2)))
        assert n.shape == (32, 32, 32)
        assert np.isfinite(n).all()
        assert abs(n.mean()) < 0.2  # zero-mean-ish
        assert 0.05 < n.std() < 0.6

    def test_fractal_normalized(self):
        n = np.asarray(
            fractal_noise_3d(jax.random.PRNGKey(1), (32, 32, 32), (1, 1, 1), octaves=2)
        )
        assert n.min() >= 0 and n.max() <= 1 and n.max() > 0.9

    def test_mog_matches_manual(self):
        centers = jnp.asarray([[8.0, 8.0, 8.0], [2.0, 12.0, 4.0]])
        sigmas = jnp.asarray([[3.0, 3.0, 3.0], [2.0, 2.0, 2.0]])
        got = np.asarray(mog_3d((16, 16, 16), centers, sigmas))
        i, j, k = np.meshgrid(*[np.arange(16.0)] * 3, indexing="ij")
        want = np.zeros((16, 16, 16))
        for c, s in zip(np.asarray(centers), np.asarray(sigmas)):
            want += np.exp(
                -(((i - c[0]) / s[0]) ** 2 + ((j - c[1]) / s[1]) ** 2 + ((k - c[2]) / s[2]) ** 2)
                / 2
            )
        np.testing.assert_allclose(got, np.clip(want, 0, 1), rtol=1e-4, atol=1e-5)


class TestMorphology:
    def test_erode_dilate_match_scipy(self):
        from scipy.ndimage import binary_dilation, binary_erosion

        mask = (RNG.random((24, 24, 24)) > 0.7).astype(np.int32)
        cube = np.ones((3, 3, 3), bool)
        got_d = np.asarray(dilate(jnp.asarray(mask), 3))
        want_d = binary_dilation(mask, cube).astype(np.int32)
        np.testing.assert_array_equal(got_d, want_d)
        got_e = np.asarray(erode(jnp.asarray(mask), 3))
        want_e = binary_erosion(mask, cube).astype(np.int32)
        np.testing.assert_array_equal(got_e, want_e)

    def test_ball_dilate_matches_scipy(self):
        from scipy.ndimage import binary_dilation

        mask = np.zeros((24, 24, 24), np.int32)
        mask[12, 12, 12] = 1
        mask[5, 6, 7] = 1
        r = 4
        x, y, z = np.ogrid[-r : r + 1, -r : r + 1, -r : r + 1]
        ball = (x**2 + y**2 + z**2) <= r * r
        got = np.asarray(ball_dilate(jnp.asarray(mask), r))
        want = binary_dilation(mask, ball).astype(np.int32)
        np.testing.assert_array_equal(got, want)

    def test_box_sum(self):
        x = RNG.random((10, 10, 10)).astype(np.float32)
        got = np.asarray(box_sum(jnp.asarray(x), 3))
        from scipy.ndimage import uniform_filter

        want = uniform_filter(x, 3, mode="constant") * 27
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestCenters:
    def test_masked_random_centers(self):
        mask = jnp.zeros((16, 16, 16), jnp.int32).at[4:8, 4:8, 4:8].set(1)
        centers, valid = masked_random_centers(jax.random.PRNGKey(0), mask, 10, 6)
        centers, valid = np.asarray(centers), np.asarray(valid)
        assert valid.sum() == 6
        for c in centers[valid]:
            assert (c >= 4).all() and (c < 8).all()


@pytest.fixture(scope="module")
def small_scanner():
    sc.SS = 64
    sc.ZS = 64
    sc.NS = 32
    yield
    sc.SS = 384
    sc.ZS = 384
    sc.NS = 128


class TestScanner:
    def test_motion_sim_runs_and_reconstructs(self, small_scanner):
        from scipy.ndimage import gaussian_filter

        from fetalsyngen_tpu.testing import phantom_seeds_and_seg

        shape = (64, 64, 64)
        _, seg = phantom_seeds_and_seg(shape, seed=1)
        out = gaussian_filter((seg > 0).astype(np.float32) * 100 + (seg > 2) * 80, 1.5).astype(
            np.float32
        )
        sm = sc.SimulateMotion(
            prob=1.0,
            scanner_params=sc.ScannerParams(
                1.0, 1.5, 2.0, 1.0, 1.5, 1.0, 1.5, 1, 2, 200, 0, 0.0, 1, 1, 0.0, 0.0, 0.05,
                None, False, 0.0,
            ),
            recon_params=sc.ReconParams(
                0.0, 0.1, 0.0, 0.0, 0.0, 0.0, 0.1, 0.4, 0.0,
                ReconMergeParams(
                    "perlin", perlin_res_list=[1], perlin_octaves_list=[1],
                    perlin_persistence=0.5, perlin_lacunarity=2, perlin_increase_size=0.25,
                ),
            ),
        )
        o, meta = sm(out, seg.astype(np.int32), resolution=(0.5, 0.5, 0.5),
                     rng=np.random.default_rng(1), key=jax.random.PRNGKey(1))
        o = np.asarray(o)
        assert np.isfinite(o).all()
        c = np.corrcoef(o[8:56, 8:56, 8:56].ravel(), out[8:56, 8:56, 8:56].ravel())[0, 1]
        assert c > 0.9, c
        assert meta["nstacks"] >= 1


class TestQualityArtifacts:
    def test_blur_cortex(self, small_scanner):
        from fetalsyngen_tpu.testing import phantom_seeds_and_seg

        _, seg = phantom_seeds_and_seg((64, 64, 64), seed=1)
        out = np.abs(RNG.normal(100, 30, (64, 64, 64))).astype(np.float32)
        bc = BlurCortex(prob=1.0, cortex_label=2, nblur_min=5, nblur_max=20)
        o, m = bc(out, seg.astype(np.int32), rng=np.random.default_rng(2), key=jax.random.PRNGKey(2))
        assert np.isfinite(np.asarray(o)).all() and m["nblur"] is not None
        assert not np.allclose(np.asarray(o), out)

    def test_boundaries_mask_zeroes_background(self):
        from fetalsyngen_tpu.testing import phantom_seeds_and_seg

        _, seg = phantom_seeds_and_seg((64, 64, 64), seed=1)
        out = np.abs(RNG.normal(100, 30, (64, 64, 64))).astype(np.float32)
        sb = SimulatedBoundaries(0.0, 0.0, 0.0)
        o, m = sb(out, seg.astype(np.int32), rng=np.random.default_rng(3), key=jax.random.PRNGKey(3))
        o = np.asarray(o)
        assert o[0, 0, 0] == 0.0  # background masked
        inner = np.asarray(seg) > 0
        np.testing.assert_allclose(o[inner], out[inner], rtol=1e-6)
