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
    CH = 16  # batched through the native threaded gzip writer
    for i0 in range(0, len(files), CH):
        chunk = files[i0 : i0 + CH]
        imgs = [nifti.load(p) for p in chunk]
        nifti.save_batch(
            chunk,
            [np.asarray(im.data).astype(np.int8) for im in imgs],
            [im.affine for im in imgs],
        )
        print(f"[{min(i0 + CH, len(files))}/{len(files)}] {chunk[-1]}")


if __name__ == "__main__":
    main()
