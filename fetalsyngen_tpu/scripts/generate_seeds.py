"""Generate intensity seeds for FetalSynthGen (offline preprocessing).

Reference parity with ``/root/reference/scripts/generate_seeds.py``: fuse
segmentation labels into meta-labels (feta/dhcp maps), derive the skull class
from nonzero-image voxels outside the segmentation, EM-cluster each
meta-label's intensities into N subclusters (sklearn GaussianMixture,
k-means++ init), and write one int8 NIfTI per (n_subclasses, meta-label).
Fan-out: one process per (subject, n_subclasses) task.

Example:
    python -m fetalsyngen_tpu.scripts.generate_seeds.py --bids_path ./data --out_path ./data/derivatives/seeds \
        --max_subclasses 6 --annotation feta
"""

from __future__ import annotations

import argparse
from multiprocessing import Pool, cpu_count
from pathlib import Path

import numpy as np

from fetalsyngen_tpu.io import nifti

# segmentation label -> meta-label maps (reference generate_seeds.py:64-85)
FETA2META = {1: 1, 4: 1, 2: 2, 6: 2, 5: 3, 7: 3, 3: 3}
DHCP2META = {1: 1, 5: 1, 2: 2, 7: 2, 9: 2, 3: 3, 6: 3, 8: 3}


def subsplit_label(img: np.ndarray, mask: np.ndarray, label2assign: int, n_clusters: int):
    """EM-cluster masked intensities (reference ``subsplit_label``, :177-187)."""
    from sklearn.mixture import GaussianMixture

    out = np.zeros(mask.shape, dtype=np.int16)
    voxels = img[mask > 0]
    if voxels.size < n_clusters:
        out[mask > 0] = label2assign
        return out
    clust = GaussianMixture(n_components=n_clusters, n_init=5, init_params="k-means++").fit_predict(
        voxels.reshape(-1, 1)
    )
    out[mask > 0] = clust + label2assign
    return out


def split_labels(image: np.ndarray, segmentation: np.ndarray, subclasses: int, label_map: dict):
    """Fuse to meta-labels + skull, then subsplit (reference :190-211)."""
    meta = np.zeros(segmentation.shape, dtype=np.int16)
    for seg_lab, meta_lab in label_map.items():
        meta[segmentation == seg_lab] = meta_lab
    # skull: nonzero image outside the segmentation (generate_seeds.py:197)
    meta[(segmentation == 0) & (image != 0)] = 4

    if subclasses == 1:
        return {m: ((meta == m) * m * 10).astype(np.int8) for m in range(1, 5)}
    return {
        m: subsplit_label(image, meta == m, 10 * m, subclasses).astype(np.int8)
        for m in range(1, 5)
    }


def process_subject(task):
    img_path, seg_path, subclasses, label_map, out_path, sub_name, session, annotation = task
    img = nifti.load(img_path)
    seg = nifti.load(seg_path)
    image = np.nan_to_num(np.asarray(img.data, dtype=np.float32))
    segm = np.nan_to_num(np.asarray(seg.data, dtype=np.float32)).astype(np.int32)
    if annotation == "dhcp":
        segm[segm == 4] = 0

    splits = split_labels(image, segm, subclasses, label_map)
    stem = Path(seg_path).name.replace(".nii.gz", "").replace(".nii", "")
    for mlabel, sub_seg in splits.items():
        anat = "anat" if not session else f"{session}/anat"
        out_dir = Path(out_path) / f"subclasses_{subclasses}" / sub_name / anat
        out_dir.mkdir(parents=True, exist_ok=True)
        nifti.save(out_dir / f"{stem}_mlabel_{mlabel}.nii.gz", sub_seg, seg.affine)
    return sub_name, subclasses


def main():
    ap = argparse.ArgumentParser(description="Generate seeds for FetalSynthGen")
    ap.add_argument("--bids_path", type=str, required=True)
    ap.add_argument("--out_path", type=str, required=True)
    ap.add_argument("--max_subclasses", type=int, default=10)
    ap.add_argument("--annotation", type=str, required=True, choices=["feta", "dhcp"])
    ap.add_argument("--workers", type=int, default=cpu_count())
    args = ap.parse_args()

    label_map = FETA2META if args.annotation == "feta" else DHCP2META
    bids_path = Path(args.bids_path).absolute()
    subjects = sorted(bids_path.glob("sub-*"))
    print(f"Found {len(subjects)} subjects in {bids_path}")

    tasks = []
    for sub in subjects:
        imgs = sorted(sub.glob("**/anat/*_T2w.nii.gz"))
        labels = sorted(sub.glob("**/anat/*_dseg.nii.gz"))
        if not imgs or not labels:
            print(f"skipping {sub.name}: missing T2w or dseg")
            continue
        for subclasses in range(1, args.max_subclasses + 1):
            tasks.append(
                (
                    str(imgs[0]),
                    str(labels[0]),
                    subclasses,
                    label_map,
                    str(args.out_path),
                    sub.name,
                    "",
                    args.annotation,
                )
            )

    with Pool(args.workers) as pool:
        for i, done in enumerate(pool.imap_unordered(process_subject, tasks)):
            print(f"[{i + 1}/{len(tasks)}] {done[0]} subclasses={done[1]}")


if __name__ == "__main__":
    main()
