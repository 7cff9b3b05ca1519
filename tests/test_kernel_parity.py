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
@pytest.mark.parametrize("tap_chunk", [8, 4])
def test_hat_pair_matches_spec_at_large_shear(unit_slope, tap_chunk):
    # tap_chunk=4 is the deform field-pass configuration (FIELD_TAP_CHUNK);
    # chunk size must never change values, only predication granularity
    va, vb = _vol(2), _vol(3)
    disp = _smooth_disp(4.0, seed=4)
    coefs = (0.8, 0.05, 1.0, 5.0)
    oa, ob = W.hat_pass_pair(
        va, vb, coefs, disp, SHAPE, 48, modes=(False, True),
        unit_slope=unit_slope, tap_chunk=tap_chunk,
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


@pytest.mark.slow
def test_scanner_engine_kernel_matches_fallback_at_production_slopes():
    """END-TO-END kernel-path A/B of the scanner engine vs the jnp fallback
    at a production-scale gap (gap_vox = 4, i.e. z-extraction lane slope 4).

    Round-3 regression guard: the original one-step z extraction pushed lane
    slope ``gap_vox`` through the hat kernel, whose windowed taps only cover
    a ~48-voxel within-block position spread — (slope-1)*127 ~ 380 voxels
    overflowed and CLAMPED silently, corrupting every TPU-path scan while
    the CPU suite (jnp fallback) stayed green. The engine now factors the z
    passes into unit-slope hats + interp matmuls (scanner._extract_pair);
    this test runs the full acquire+recon on BOTH the interpreter-mode
    kernel path and the jnp fallback and requires voxel equality.
    """
    import fetalsyngen_tpu.generator.artifacts.scanner as sc
    from fetalsyngen_tpu.generator.artifacts.motion import sample_motion
    from fetalsyngen_tpu.generator.artifacts.transforms import (
        random_init_stack_transforms,
    )
    from scipy.ndimage import gaussian_filter

    CUBE, NSG = 128, 32  # cube % 128 == 0 so _v1_ok takes the kernel path
    rng = np.random.default_rng(11)
    shape = (96, 96, 96)
    base = np.zeros(shape, np.float32)
    base[20:76, 24:72, 22:74] = 100.0
    vol = gaussian_filter(
        base + rng.normal(0, 5, shape).astype(np.float32) * (base > 0), 1.0
    ).astype(np.float32)
    mask = (vol > 5).astype(np.float32)

    res, res_s, thick, gap = 0.5, 0.7, 2.0, 2.0
    rs, gap_vox = res_s / res, gap / res  # slope 4: far past the tap window
    ns = min(int(max(shape) * res / gap) + 2, NSG)
    t_init = random_init_stack_transforms(ns, gap, False, 3.0, rng)
    t_target = sample_motion(np.arange(ns) * 1.0, rng).compose(t_init)
    mats_vox = t_target.matrix(True).copy()
    mats_vox[:, :, 3] /= res
    geo = sc._stack_geometry(
        t_init.matrix(True)[0, :, :3], mats_vox, shape, ns, CUBE, NSG
    )
    z0 = float((CUBE - 1) / 2.0 - (ns - 1) / 2.0 * gap_vox)
    sig = jnp.asarray(
        [sc.GAUSSIAN_FWHM * thick / res, sc.SINC_FWHM * rs, sc.SINC_FWHM * rs],
        jnp.float32,
    )
    sig_rec = jnp.asarray(
        [sc.GAUSSIAN_FWHM * thick / res, sc.SINC_FWHM * rs], jnp.float32
    )
    q_idx, w_ang, w_scl, w_dlt = geo["fwd"]
    i_q, i_ang, i_scl, i_dlt = sc.decompose_affine_paeth_host(
        geo["Minv"], -geo["Minv"] @ geo["t_stack"], CUBE
    )

    def run():
        slices, valid = sc._acquire_stack(
            jnp.asarray(vol), jnp.asarray(mask),
            jnp.int32(q_idx), jnp.asarray(w_ang), jnp.float32(w_scl),
            jnp.asarray(w_dlt), jnp.asarray(geo["G"]), jnp.float32(rs),
            jnp.float32(gap_vox), jnp.float32(z0), sig, jnp.float32(0.15),
            jnp.int32(ns), jax.random.PRNGKey(0), jnp.float32(1.0),
            jnp.asarray(False), jnp.float32(0.0), jnp.float32(0.0),
            jnp.float32(0.1), cube=CUBE, ns_grid=NSG,
        )
        v_s, w_s = sc._recon_stack(
            slices, valid, jnp.asarray(geo["G"]), jnp.float32(rs),
            jnp.float32(gap_vox), jnp.float32(z0), sig_rec,
            jnp.int32(i_q), jnp.asarray(i_ang), jnp.float32(i_scl),
            jnp.asarray(i_dlt), cube=CUBE, ns_grid=NSG, out_shape=shape,
        )
        return np.asarray(slices), np.asarray(valid), np.asarray(v_s), np.asarray(w_s)

    W._INTERPRET = False
    jax.clear_caches()  # drop any interpret-mode traces of the same shapes
    ref = run()
    assert ref[1].sum() >= 10  # enough valid slices to be a meaningful A/B
    W._INTERPRET = True
    jax.clear_caches()  # drop the fallback traces so the kernel path retraces
    got = run()
    for r, g, name in [
        (ref[0], got[0], "slices"), (ref[1], got[1], "valid"),
        (ref[2], got[2], "recon value"), (ref[3], got[3], "recon weight"),
    ]:
        scale = max(np.abs(r).max(), 1.0)
        np.testing.assert_allclose(g, r, atol=2e-4 * scale, err_msg=name)


def test_hat_pass_bf16_storage_io():
    """Under the stream storage scope the kernel takes/emits bf16 HBM blocks
    while tap math stays f32 — values must track the f32 kernel to bf16
    rounding (~0.4% rel)."""
    from fetalsyngen_tpu.ops.linops import storage_scope

    v = _vol(7)
    disp = _smooth_disp(4.0, seed=8)
    coefs = (0.6, 0.05, 1.0, 2.0)
    ref = np.asarray(W.hat_pass(v, coefs, disp, SHAPE, 48, False))
    with storage_scope(jnp.bfloat16):
        got = W.hat_pass(v, coefs, disp, SHAPE, 48, False)
    assert got.dtype == jnp.bfloat16
    gotf = np.asarray(got).astype(np.float32)
    np.testing.assert_allclose(gotf, ref, atol=2e-2, rtol=2e-2)

    with storage_scope(jnp.bfloat16):
        oa, ob = W.hat_pass_pair(
            v, _vol(9), coefs, disp, SHAPE, 48, modes=(False, False)
        )
    assert oa.dtype == jnp.bfloat16 and ob.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(oa).astype(np.float32), ref, atol=2e-2, rtol=2e-2
    )


# The 128-row block shape mirrors the production constraint H % 128 == 0
# (blocks never straddle slices, so the within-block span stays inside the
# budget); a straddling H would add a row_i term the budgets exclude.
SHAPE128 = (16, 128, 256)


def _vol128(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random(SHAPE128, np.float32))


@pytest.mark.parametrize("unit_slope", [False, True])
def test_hat_pass_128_row_blocks_match_spec(unit_slope, monkeypatch):
    """The adaptive 128-row block path (engaged at scanner-tier shapes,
    R >= 512^2, H % 128 == 0) must be value-identical to the 64-row path —
    block geometry is pure scheduling (<= 2 nonzero taps per element,
    ascending tap order either way). Forced on at test scale via
    _choose_block_rows."""
    monkeypatch.setattr(W, "_choose_block_rows", lambda R, H: 128)
    v = _vol128(11)
    rng = np.random.default_rng(12)
    disp = jnp.asarray(
        np.clip(rng.normal(0, 4.0, SHAPE128), -14, 14).astype(np.float32)
    )
    coefs = (0.2, 0.1, 1.0, 0.0)
    out = W.hat_pass(v, coefs, disp, SHAPE128, 48, False, unit_slope=unit_slope)
    ref = _jnp_reference(v.reshape(-1, SHAPE128[2]), coefs, disp, SHAPE128, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_hat_pair_128_row_blocks_match_spec(monkeypatch):
    monkeypatch.setattr(W, "_choose_block_rows", lambda R, H: 128)
    va, vb = _vol128(13), _vol128(14)
    rng = np.random.default_rng(15)
    disp = jnp.asarray(
        np.clip(rng.normal(0, 4.0, SHAPE128), -14, 14).astype(np.float32)
    )
    coefs = (0.1, 0.05, 1.0, 5.0)
    oa, ob = W.hat_pass_pair(
        va, vb, coefs, disp, SHAPE128, 48, modes=(False, True), unit_slope=True
    )
    x2 = SHAPE128[2]
    ra = _jnp_reference(va.reshape(-1, x2), coefs, disp, SHAPE128, False)
    rb = _jnp_reference(vb.reshape(-1, x2), coefs, disp, SHAPE128, True)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ra), atol=5e-5)
    np.testing.assert_allclose(np.asarray(ob), np.asarray(rb), atol=5e-5)


def test_saturated_lane_exclusion_in_block_bounds():
    """Fully-saturated lanes must not inflate a block's tap interval
    (round-5 bounds fix): their outputs come from the kernel's saturation
    select, so their clamped rel values are excluded from (mn, mx). A
    whole-row block mixing valid low-spread lanes with a band of fully
    saturated high lanes previously span-clamped the VALID elements."""
    shape = (4, 64, 256)  # OW=256 -> whole-row unit-slope lane block
    rng = np.random.default_rng(21)
    v = jnp.asarray(rng.random(shape, np.float32))
    A = np.zeros((3, 256), np.float32)
    A[0] = rng.uniform(-0.01, 0.01, 256)
    A[1] = rng.uniform(-0.01, 0.01, 256)
    A[2, :200] = rng.uniform(-10, 10, 200)   # valid lanes, spread << maxspan
    A[2, 200:] = -300.0                      # lanes 200.. fully saturate low
    out = W.hat_pass(v, (0.0, 0.0, 1.0, 0.0), jnp.asarray(A), shape, 48,
                     False, unit_slope=True)
    ref = _jnp_reference(
        v.reshape(-1, shape[2]), (0.0, 0.0, 1.0, 0.0), None, shape, False
    )
    # rebuild reference positions incl. the lane-affine part
    R = shape[0] * shape[1]
    rows = jnp.arange(R, dtype=jnp.float32)
    ri = jnp.floor(rows / shape[1])
    rj = rows - ri * shape[1]
    lanes = jnp.arange(shape[2], dtype=jnp.float32)
    pos = lanes[None, :] + (
        jnp.asarray(A)[0][None, :] * ri[:, None]
        + jnp.asarray(A)[1][None, :] * rj[:, None]
        + jnp.asarray(A)[2][None, :]
    )
    ref = W._hat_pass_jnp(v.reshape(R, shape[2]), pos, False).reshape(shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
