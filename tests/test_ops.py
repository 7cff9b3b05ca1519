"""Voxel-level equivalence tests: JAX ops vs independent NumPy golden refs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fetalsyngen_tpu.ops.affine import centered_grid, make_affine_matrix
from fetalsyngen_tpu.ops.blur import blur_half_len, gaussian_blur_3d, gaussian_kernel_fixed
from fetalsyngen_tpu.ops.interp import (
    interp_axis_linear,
    nearest_interp,
    trilinear_interp,
    zoom,
)

from np_reference import (
    gaussian_blur_ref,
    gaussian_kernel_ref,
    make_affine_matrix_ref,
    nearest_ref,
    trilinear_ref,
    zoom_ref,
)

RNG = np.random.default_rng(0)


def rand_vol(shape=(24, 20, 28)):
    return RNG.normal(size=shape).astype(np.float32)


def rand_coords(shape, vol_shape, margin=3.0):
    coords = []
    for d in range(3):
        coords.append(
            RNG.uniform(-margin, vol_shape[d] - 1 + margin, size=shape).astype(np.float32)
        )
    return coords


class TestTrilinear:
    def test_matches_reference_with_oob(self):
        vol = rand_vol()
        II, JJ, KK = rand_coords((11, 13, 7), vol.shape)
        got = np.asarray(trilinear_interp(jnp.asarray(vol), *map(jnp.asarray, (II, JJ, KK))))
        want = trilinear_ref(vol.astype(np.float64), II, JJ, KK)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_default_value(self):
        vol = rand_vol()
        II = np.array([-1.0, 0.0, 5.0])  # 0.0 is OOB in reference semantics (x > 0 strictly)
        JJ = np.array([5.0, 5.0, 5.0])
        KK = np.array([5.0, 5.0, 5.0])
        got = np.asarray(
            trilinear_interp(jnp.asarray(vol), *map(jnp.asarray, (II, JJ, KK)), default_value=7.5)
        )
        assert got[0] == 7.5 and got[1] == 7.5
        assert got[2] != 7.5

    def test_exact_upper_corner(self):
        vol = rand_vol()
        D, H, W = vol.shape
        got = np.asarray(
            trilinear_interp(
                jnp.asarray(vol),
                jnp.array([D - 1.0]),
                jnp.array([H - 1.0]),
                jnp.array([W - 1.0]),
            )
        )
        np.testing.assert_allclose(got[0], vol[-1, -1, -1], rtol=1e-6)

    def test_identity_on_grid(self):
        vol = rand_vol((8, 9, 10))
        ii, jj, kk = np.meshgrid(
            np.arange(8.0), np.arange(9.0), np.arange(10.0), indexing="ij"
        )
        got = np.asarray(trilinear_interp(jnp.asarray(vol), *map(jnp.asarray, (ii, jj, kk))))
        interior = (ii > 0) & (jj > 0) & (kk > 0)
        np.testing.assert_allclose(got[interior], vol[interior], rtol=1e-6)
        assert (got[~interior] == 0).all()


class TestNearest:
    def test_matches_reference(self):
        vol = rand_vol()
        II, JJ, KK = rand_coords((9, 8, 6), vol.shape)
        got = np.asarray(nearest_interp(jnp.asarray(vol), *map(jnp.asarray, (II, JJ, KK))))
        want = nearest_ref(vol, II, JJ, KK)
        np.testing.assert_array_equal(got, want)

    def test_integer_labels(self):
        vol = RNG.integers(0, 50, size=(16, 16, 16)).astype(np.int32)
        II, JJ, KK = rand_coords((5, 5, 5), vol.shape)
        got = np.asarray(nearest_interp(jnp.asarray(vol), *map(jnp.asarray, (II, JJ, KK))))
        want = nearest_ref(vol, II, JJ, KK)
        np.testing.assert_array_equal(got, want)
        assert got.dtype == np.int32


class TestBlur:
    @pytest.mark.parametrize("sigma", [0.4, 1.0, 2.3])
    def test_kernel_matches(self, sigma):
        half = blur_half_len(3.0)
        got = np.asarray(gaussian_kernel_fixed(jnp.float32(sigma), half))
        want = gaussian_kernel_ref(sigma)
        sl = int(np.ceil(3 * sigma))
        pad = half - sl
        np.testing.assert_allclose(got[pad : len(got) - pad] if pad else got, want, rtol=1e-5)
        if pad:
            assert (got[:pad] == 0).all() and (got[-pad:] == 0).all()

    def test_blur_matches_reference(self):
        vol = rand_vol((20, 18, 22))
        stds = np.array([1.3, 0.0, 2.1])
        half = blur_half_len(3.0)
        got = np.asarray(gaussian_blur_3d(jnp.asarray(vol), jnp.asarray(stds), half))
        want = gaussian_blur_ref(vol, stds)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_zero_sigma_is_identity(self):
        vol = rand_vol((10, 10, 10))
        got = np.asarray(gaussian_blur_3d(jnp.asarray(vol), jnp.zeros(3), 5))
        np.testing.assert_allclose(got, vol, rtol=1e-6)


class TestZoom:
    @pytest.mark.parametrize("factor", [(0.5, 0.5, 0.5), (2.0, 2.0, 2.0), (1.7, 0.6, 1.0)])
    def test_matches_reference(self, factor):
        vol = rand_vol((12, 14, 10))
        factor = np.asarray(factor)
        out_shape = tuple(np.round(np.array(vol.shape) * factor).astype(int))
        got = np.asarray(zoom(jnp.asarray(vol), out_shape, jnp.asarray(factor)))
        want = zoom_ref(vol, factor)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_channels(self):
        vol = RNG.normal(size=(6, 7, 8, 3)).astype(np.float32)
        factor = np.array([2.0, 2.0, 2.0])
        out_shape = (12, 14, 16)
        got = np.asarray(zoom(jnp.asarray(vol), out_shape, jnp.asarray(factor)))
        want = zoom_ref(vol, factor)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_dynamic_in_size(self):
        """Zoom from a logical corner of a fixed buffer == zoom of the crop."""
        full = rand_vol((16, 16, 16))
        logical = (9, 11, 8)
        buf = np.zeros_like(full)
        buf[: logical[0], : logical[1], : logical[2]] = full[
            : logical[0], : logical[1], : logical[2]
        ]
        factor = np.array([16 / 9, 16 / 11, 16 / 8])
        got = np.asarray(
            zoom(
                jnp.asarray(buf),
                (16, 16, 16),
                jnp.asarray(factor),
                in_shape=jnp.asarray(logical),
            )
        )
        want = zoom_ref(full[: logical[0], : logical[1], : logical[2]], factor)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestAffine:
    def test_matrix_matches_reference(self):
        rot = RNG.uniform(-0.3, 0.3, 3)
        sh = RNG.uniform(-0.02, 0.02, 3)
        s = 1 + RNG.uniform(-0.1, 0.1, 3)
        got = np.asarray(make_affine_matrix(rot, sh, s))
        want = make_affine_matrix_ref(rot, sh, s)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_centered_grid(self):
        xc, yc, zc = centered_grid((4, 6, 8))
        assert float(xc[0, 0, 0]) == -1.5
        assert float(yc[0, 0, 0]) == -2.5
        assert float(zc[0, 0, -1]) == 3.5


class TestInterpAxis:
    def test_matches_take_based(self):
        x = rand_vol((10, 12, 14))
        coords = RNG.uniform(0, 9, size=7).astype(np.float32)
        got = np.asarray(interp_axis_linear(jnp.asarray(x), jnp.asarray(coords), axis=0))
        f = np.floor(coords).astype(int)
        c = np.minimum(f + 1, 9)
        w = coords - f
        want = x[f] * (1 - w)[:, None, None] + x[c] * w[:, None, None]
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestScopeSafety:
    """Shared jitted ops must be immune to the production scopes: their
    aval-keyed trace caches are shared between the scoped stream and the
    f32 replay-faithful host path (the poisoning direction is order-
    dependent, so this test forces the bad order explicitly)."""

    def test_box_sum_immune_to_storage_scope(self):
        import jax
        from fetalsyngen_tpu.ops.linops import precision_scope, storage_scope
        from fetalsyngen_tpu.ops.morphology import box_sum

        rng = np.random.default_rng(3)
        v = jnp.asarray(rng.random((32, 32, 32), np.float32))
        # scoped trace FIRST (would poison an unpinned cache) ...
        with precision_scope(jax.lax.Precision.DEFAULT), storage_scope(jnp.bfloat16):
            scoped = np.asarray(box_sum(v, 3))
        # ... then the host-path call with identical avals must still be
        # f32-exact vs an independent computation
        host = np.asarray(box_sum(v, 3))
        ref = np.zeros_like(np.asarray(v))
        vn = np.asarray(v)
        pad = np.pad(vn, 1)
        for di in range(3):
            for dj in range(3):
                for dk in range(3):
                    ref += pad[di:di + 32, dj:dj + 32, dk:dk + 32]
        np.testing.assert_allclose(host, ref, rtol=1e-6, atol=1e-4)
        assert host.dtype == np.float32
        np.testing.assert_allclose(scoped, ref, rtol=1e-6, atol=1e-4)


def test_floor_div_exact_matches_f64_law():
    """f32 floor-division with f64-correct truncation (ops/numerics.py).

    Includes the observed failure case: 22 / 1.1f rounds to 20.0 in f32 but
    the f64 quotient is 19.9999...; the reference's grid-size law
    (synthseg.py:84) truncates it to 19.
    """
    import numpy as np
    import jax.numpy as jnp

    from fetalsyngen_tpu.ops.numerics import floor_div_exact

    a = np.float32(22.0)
    b = np.float32(1.1)
    assert int(floor_div_exact(jnp.float32(a), jnp.float32(b))) == int(
        np.float64(a) / np.float64(b)
    ) == 19

    rng = np.random.default_rng(0)
    # random grid-law inputs: a = shape * res, b = spacing
    shapes = rng.integers(16, 1537, size=3000).astype(np.float32)
    res = rng.uniform(0.25, 4.0, size=3000).astype(np.float32)
    spac = rng.uniform(0.25, 4.0, size=3000).astype(np.float32)
    av = (shapes * res).astype(np.float32)
    keep = (av / spac) < 4000  # stay in the documented quotient range
    av, spac = av[keep], spac[keep]
    want = (av.astype(np.float64) / spac.astype(np.float64)).astype(np.int32)
    got = np.asarray(floor_div_exact(jnp.asarray(av), jnp.asarray(spac)))
    np.testing.assert_array_equal(got, want)

    # adversarial: quotients exactly on / within an ulp of integers
    n = rng.integers(1, 2000, size=2000)
    b2 = rng.uniform(0.3, 2.0, size=2000).astype(np.float32)
    a2 = (n * b2.astype(np.float64)).astype(np.float32)  # a ~= n*b to f32 rounding
    keep = (a2.astype(np.float64) / b2 < 4000) & (a2 > 0)
    a2, b2 = a2[keep], b2[keep]
    want = (a2.astype(np.float64) / b2.astype(np.float64)).astype(np.int32)
    got = np.asarray(floor_div_exact(jnp.asarray(a2), jnp.asarray(b2)))
    np.testing.assert_array_equal(got, want)
