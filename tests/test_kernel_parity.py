"""Hat-KERNEL parity at deformation scale (Pallas interpreter vs jnp spec).

The rest of the CPU suite exercises the ``_hat_pass_jnp`` fallback (CPU
backend, no FSG_PALLAS_INTERPRET), so the kernel logic — window base, clamp
bounds, roll ladder, adaptive span chunks — would otherwise have NO CPU
coverage. This module flips ``warp._INTERPRET`` on so ``_use_pallas()`` takes
the kernel path in interpreter mode, and drives it with LARGE global shears
(|rel| ~ 100 voxels): the class of position map where a window-bound bug
clamps n0 and silently samples tens of voxels off (caught by review in round
2 — a 20-degree deformation rotation produces exactly these rel magnitudes in
the displacement passes).

Shapes here are unique to this module so the jit cache can't serve stale
non-interpret traces.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import fetalsyngen_tpu.ops.warp as W

# D=128 rows drive the large row term; H=32 satisfies _v1_ok; W=256 lanes
# exercise both 128-lane blocks and the 256-wide unit-slope path.
SHAPE = (128, 32, 256)


@pytest.fixture(autouse=True)
def _interpret_kernels():
    old = W._INTERPRET
    W._INTERPRET = True
    yield
    W._INTERPRET = old


def _jnp_reference(x2d, coefs, disp, shape, nearest, OW=None):
    D, H, S = shape
    OW = S if OW is None else OW
    R = D * H
    rows = jnp.arange(R, dtype=jnp.float32)
    ri = jnp.floor(rows / H)
    rj = rows - ri * H
    lanes = jnp.arange(OW, dtype=jnp.float32)
    pos = coefs[0] * ri[:, None] + coefs[1] * rj[:, None] + coefs[2] * lanes[None, :] + coefs[3]
    if disp is not None:
        pos = pos + disp.reshape(R, OW)
    return W._hat_pass_jnp(x2d, pos, nearest).reshape(D, H, OW)


def _vol(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random(SHAPE, np.float32))


def _smooth_disp(scale, seed=1):
    from scipy.ndimage import zoom as ndzoom

    rng = np.random.default_rng(seed)
    coarse = rng.normal(0, scale, (8, 4, 8))
    return jnp.asarray(
        np.clip(ndzoom(coarse, (16, 8, 32), order=1), -14, 14).astype(np.float32)
    )


# Coefficient sets covering the failure classes:
#   - big POSITIVE global row shear (rel up to ~+115: needs n0 well past the
#     old right-hand window bound)
#   - big NEGATIVE shear (lo-side bound)
#   - unit-slope versions of both (the wide 256-lane block path)
CASES = [
    ("pos-shear", (0.9, 0.1, 1.0, 0.0), False),
    ("neg-shear", (-0.9, -0.1, 1.0, 0.0), False),
    ("pos-shear-wide", (0.9, 0.1, 1.0, 0.0), True),
    ("neg-shear-wide", (-0.9, -0.1, 1.0, 0.0), True),
    ("scaled-lane", (0.5, 0.05, 1.1, -20.0), False),
]


@pytest.mark.parametrize("name,coefs,unit_slope", CASES)
def test_hat_pass_matches_spec_at_large_shear(name, coefs, unit_slope):
    v = _vol()
    disp = _smooth_disp(4.0)
    out = W.hat_pass(v, coefs, disp, SHAPE, 48, False, unit_slope=unit_slope)
    ref = _jnp_reference(v.reshape(-1, SHAPE[2]), coefs, disp, SHAPE, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


@pytest.mark.parametrize("unit_slope", [False, True])
def test_hat_pair_matches_spec_at_large_shear(unit_slope):
    va, vb = _vol(2), _vol(3)
    disp = _smooth_disp(4.0, seed=4)
    coefs = (0.8, 0.05, 1.0, 5.0)
    oa, ob = W.hat_pass_pair(
        va, vb, coefs, disp, SHAPE, 48, modes=(False, True), unit_slope=unit_slope
    )
    x2 = SHAPE[2]
    ra = _jnp_reference(va.reshape(-1, x2), coefs, disp, SHAPE, False)
    rb = _jnp_reference(vb.reshape(-1, x2), coefs, disp, SHAPE, True)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ra), atol=5e-5)
    np.testing.assert_allclose(np.asarray(ob), np.asarray(rb), atol=5e-5)


def test_hat_pass_nearest_large_shear():
    v = _vol(5)
    coefs = (0.9, 0.0, 1.0, -40.0)
    out = W.hat_pass(v, coefs, None, SHAPE, 48, True)
    ref = _jnp_reference(v.reshape(-1, SHAPE[2]), coefs, None, SHAPE, True)
    # nearest ties (pos exactly at .5) may round differently; require
    # near-total agreement and no systematic offset
    agree = np.mean(np.asarray(out) == np.asarray(ref))
    assert agree > 0.999, agree
