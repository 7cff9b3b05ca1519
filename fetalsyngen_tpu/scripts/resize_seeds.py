"""Cast all seed NIfTIs under a directory to int8 (reference ``resize_seeds.py``)."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from fetalsyngen_tpu.io import nifti


def main():
    ap = argparse.ArgumentParser(description="Cast the seeds to int8")
    ap.add_argument("path", type=str, help="Directory containing seed files")
    args = ap.parse_args()

    files = sorted(Path(args.path).glob("**/*.nii.gz"))
    for i, p in enumerate(files):
        img = nifti.load(p)
        nifti.save(p, np.asarray(img.data).astype(np.int8), img.affine)
        print(f"[{i + 1}/{len(files)}] {p}")


if __name__ == "__main__":
    main()
