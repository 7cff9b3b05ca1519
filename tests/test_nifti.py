"""NIfTI IO + RAS orientation tests (pure-numpy reader/writer)."""

import numpy as np
import pytest

from fetalsyngen_tpu.io import nifti

RNG = np.random.default_rng(1)


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32, np.float32, np.int8])
@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(tmp_path, dtype, gz):
    data = RNG.integers(0, 100, size=(7, 9, 11)).astype(dtype)
    affine = np.array(
        [
            [0.5, 0, 0, -12.0],
            [0, 0.5, 0, -5.0],
            [0, 0, 0.5, 3.0],
            [0, 0, 0, 1.0],
        ]
    )
    path = tmp_path / ("x.nii.gz" if gz else "x.nii")
    nifti.save(path, data, affine)
    img = nifti.load(path)
    np.testing.assert_array_equal(img.data, data)
    np.testing.assert_allclose(img.affine, affine, atol=1e-5)
    np.testing.assert_allclose(img.zooms, [0.5, 0.5, 0.5], atol=1e-6)


def test_to_ras_identity():
    data = RNG.normal(size=(4, 5, 6))
    affine = np.eye(4)
    out, aff = nifti.to_ras(data, affine)
    np.testing.assert_array_equal(out, data)
    np.testing.assert_allclose(aff, affine)


def test_to_ras_flip():
    """LAS -> RAS: flip the first axis, shift the origin."""
    data = RNG.normal(size=(4, 5, 6))
    affine = np.diag([-1.0, 1.0, 1.0, 1.0])
    out, aff = nifti.to_ras(data, affine)
    np.testing.assert_array_equal(out, data[::-1])
    assert aff[0, 0] == 1.0
    # voxel (0,0,0) of output maps to world x of old voxel (3,0,0) = -3
    np.testing.assert_allclose(aff[:3, 3], [-3.0, 0.0, 0.0])


def test_to_ras_permutation():
    """Axes stored as (z, y, x) should be transposed back."""
    data = RNG.normal(size=(3, 5, 7))
    affine = np.array(
        [
            [0, 0, 1.0, 0],
            [0, 1.0, 0, 0],
            [1.0, 0, 0, 0],
            [0, 0, 0, 1.0],
        ]
    )
    out, aff = nifti.to_ras(data, affine)
    assert out.shape == (7, 5, 3)
    np.testing.assert_array_equal(out, np.transpose(data, (2, 1, 0)))
    np.testing.assert_allclose(aff[:3, :3], np.eye(3))


def test_to_ras_world_points_invariant():
    """Reorientation must not change the voxel->world mapping of content."""
    data = np.arange(2 * 3 * 4, dtype=float).reshape(2, 3, 4)
    affine = np.array(
        [
            [0, -0.7, 0, 4.0],
            [1.1, 0, 0, -2.0],
            [0, 0, -0.9, 7.0],
            [0, 0, 0, 1.0],
        ]
    )
    out, new_aff = nifti.to_ras(data, affine)
    # pick a few voxels of the original; find them in the reoriented volume
    for idx in [(0, 0, 0), (1, 2, 3), (1, 0, 2)]:
        world = affine @ np.array([*idx, 1.0])
        # invert new affine to find new voxel coords
        new_idx = np.linalg.solve(new_aff, world)
        new_idx = np.round(new_idx[:3]).astype(int)
        assert out[tuple(new_idx)] == data[idx]


def test_scl_slope(tmp_path):
    """Reader applies scl_slope / scl_inter like nibabel get_fdata."""
    import struct

    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    path = tmp_path / "scaled.nii"
    nifti.save(path, data, np.eye(4))
    raw = bytearray(path.read_bytes())
    struct.pack_into("<2f", raw, 112, 2.0, 1.0)  # slope=2, inter=1
    path.write_bytes(bytes(raw))
    img = nifti.load(path)
    np.testing.assert_allclose(img.data, data.astype(np.float32) * 2 + 1)


def test_load_reference_seed_if_available():
    """Integration: parse a real seed NIfTI from the reference tree."""
    import os

    p = (
        "/root/reference/data/derivatives/seeds/subclasses_1/sub-sta21/anat/"
        "sub-sta21_rec-irtk_T2w_dseg_mlabel_1.nii.gz"
    )
    if not os.path.exists(p):
        pytest.skip("reference data not mounted")
    img = nifti.load_ras(p)
    assert img.data.ndim == 3
    assert img.data.max() > 0
