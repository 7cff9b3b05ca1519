"""Native (C++/zlib) NIfTI loader: build + bit-exact agreement with the
pure-Python reader."""

import numpy as np
import pytest

from fetalsyngen_tpu.io import native, nifti

from fixtures import SHAPE, build_bids_tree


@pytest.fixture(scope="module")
def seed_files(tmp_path_factory):
    root = build_bids_tree(tmp_path_factory.mktemp("bids"))
    return sorted(
        str(p) for p in root.glob("derivatives/seeds/subclasses_2/sub-aaa/anat/*.nii.gz")
    )


def test_native_builds():
    if not native.available():
        pytest.skip("no C++ toolchain / zlib available")


def test_batch_matches_python_reader(seed_files):
    if not native.available():
        pytest.skip("native loader unavailable")
    got = native.load_labels_batch(seed_files, SHAPE)
    assert got is not None and len(got) == len(seed_files)
    for g, p in zip(got, seed_files):
        want = nifti.load(p).data.astype(np.int32)
        np.testing.assert_array_equal(np.asarray(g), want)


def test_shape_mismatch_returns_none(seed_files):
    if not native.available():
        pytest.skip("native loader unavailable")
    assert native.load_labels_batch(seed_files, (8, 8, 8)) is None


def test_save_batch_roundtrip(tmp_path):
    """Native threaded gzip writer == Python writer semantics (load parity
    across dtypes and affines); falls back silently when unavailable."""
    rng = np.random.default_rng(3)
    affine = np.diag([0.5, 0.5, 0.5, 1.0])
    affine[:3, 3] = [-7.0, 2.0, 4.5]
    vols = [
        rng.random((24, 20, 16)).astype(np.float32),
        rng.integers(0, 50, (16, 16, 16)).astype(np.int16),
        rng.integers(0, 4, (12, 18, 10)).astype(np.int8),
    ]
    paths = [str(tmp_path / f"v{i}.nii.gz") for i in range(len(vols))]
    nifti.save_batch(paths, vols, [affine] * len(vols))
    for p, want in zip(paths, vols):
        im = nifti.load(p)
        np.testing.assert_array_equal(im.data, want)
        np.testing.assert_allclose(im.affine[:3], affine[:3], atol=1e-6)
