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
