"""Synthetic mini-BIDS fixture: a tiny standalone dataset for tests.

Builds the same tree layout as the reference's in-repo ``data/`` fixture
(``sub-*/anat/*_T2w.nii.gz``, ``*_dseg.nii.gz``, and
``derivatives/seeds/subclasses_N/sub-*/anat/*_mlabel_M.nii.gz``) but from
procedurally generated small volumes, so tests need no external data.
"""

from pathlib import Path

import numpy as np

from fetalsyngen_tpu.io import nifti

SHAPE = (64, 64, 64)
SUBJECTS = ("sub-aaa", "sub-bbb")
N_SUBCLASSES = (1, 2)


def make_phantom(rng: np.random.Generator, shape=SHAPE):
    """Sphere-in-sphere phantom: seg labels 0..7, plausible T2w-ish image."""
    zz = np.stack(
        np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    )
    r = np.sqrt((zz**2).sum(0))
    seg = np.zeros(shape, dtype=np.int16)
    seg[r < 0.9] = 1  # CSF
    seg[r < 0.7] = 2  # GM
    seg[r < 0.5] = 3  # WM
    seg[r < 0.2] = 4  # deep
    img = (seg.astype(np.float32) * 60 + rng.normal(0, 5, shape)).clip(0, 255)
    return img.astype(np.float32), seg


def build_bids_tree(root: Path, rng: np.random.Generator | None = None) -> Path:
    rng = rng or np.random.default_rng(7)
    affine = np.diag([0.5, 0.5, 0.5, 1.0])
    for sub in SUBJECTS:
        anat = root / sub / "anat"
        anat.mkdir(parents=True, exist_ok=True)
        img, seg = make_phantom(rng)
        nifti.save(anat / f"{sub}_T2w.nii.gz", img, affine)
        nifti.save(anat / f"{sub}_dseg.nii.gz", seg, affine)
        for n_sub in N_SUBCLASSES:
            for mlabel in range(1, 5):
                sdir = root / "derivatives" / "seeds" / f"subclasses_{n_sub}" / sub / "anat"
                sdir.mkdir(parents=True, exist_ok=True)
                # seeds for meta-label m live in [10*m, 10*m + n_sub)
                seed = np.zeros(SHAPE, dtype=np.int8)
                region = seg == mlabel
                labels = 10 * mlabel + rng.integers(0, n_sub, size=int(region.sum()))
                seed[region] = labels.astype(np.int8)
                nifti.save(sdir / f"{sub}_dseg_mlabel_{mlabel}.nii.gz", seed, affine)
    return root
