"""On-chip attribution of the stream's multi-tier / dz-split cost.

Builds the same mini-BIDS fixture as bench.bench_stream and times the
end-to-end stream under engine variants:
  - single-tier 384 (the round-3 configuration)
  - full tier set (384, 512, 640)
  - each with/without the small 256 px-frame tier and the dz-split.

Usage: python scripts/profile_stream_tiers.py [--iters 8] [--variant NAME]
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def build_ds(shape):
    from fetalsyngen_tpu.config import instantiate, load_yaml, resolve_interpolations
    from fetalsyngen_tpu.data.datasets import FetalSynthDataset
    from fetalsyngen_tpu.io import nifti
    from fetalsyngen_tpu.testing import phantom_seeds_and_seg

    root = Path(tempfile.mkdtemp(prefix="fsg_tierprof_"))
    for si, sub in enumerate(["sub-b01", "sub-b02"]):
        seeds_np, seg_np = phantom_seeds_and_seg(shape, seed=si)
        anat = root / sub / "anat"
        anat.mkdir(parents=True)
        nifti.save(anat / f"{sub}_dseg.nii.gz", seg_np.astype(np.int16))
        nifti.save(anat / f"{sub}_T2w.nii.gz", (seg_np > 0).astype(np.float32))
        for n in (1, 2):
            sd = root / "derivatives" / "seeds" / f"subclasses_{n}" / sub / "anat"
            sd.mkdir(parents=True)
            for m in range(1, 5):
                part = np.where(seeds_np % 4 == (m - 1), seeds_np, 0).astype(np.int8)
                nifti.save(sd / f"{sub}_mlabel_{m}.nii.gz", part)
    gen_cfg = resolve_interpolations(load_yaml("configs/dataset/generator/default.yaml"))
    gen_cfg["shape"] = list(shape)
    gen_cfg["spatial_deform"]["size"] = list(shape)
    generator = instantiate(gen_cfg)
    return FetalSynthDataset(str(root), generator, str(root / "derivatives" / "seeds"))


def run(ds, iters, batch=4, **kw):
    from fetalsyngen_tpu.parallel.input_pipeline import SyntheticStream

    stream = SyntheticStream(ds, batch_size=batch, seed=0, prefetch=False, **kw)
    it = iter(stream)
    for _ in range(2):
        b = next(it)
        float(jnp.sum(b["image"][..., ::64, ::64, ::64]))
    t0 = time.perf_counter()
    for _ in range(iters):
        b = next(it)
        float(jnp.sum(b["image"][..., ::64, ::64, ::64]))
    dt = time.perf_counter() - t0
    return batch * iters / dt


VARIANTS = {
    "r3_single384": dict(cube=(384,), small_tier=False, dz_split=False),
    "single384_small": dict(cube=(384,), small_tier=True, dz_split=False),
    "multitier": dict(small_tier=True, dz_split=False),
    "multitier_nosmall": dict(small_tier=False, dz_split=False),
    "multitier_dzsplit": dict(small_tier=True, dz_split=True),
    "single384_dzsplit": dict(cube=(384,), small_tier=True, dz_split=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--variant", action="append", default=None)
    args = ap.parse_args()
    shape = (256, 256, 256)
    ds = build_ds(shape)
    names = args.variant or list(VARIANTS)
    for name in names:
        v = run(ds, args.iters, **VARIANTS[name])
        print(json.dumps({"variant": name, "vol_per_s": round(v, 3)}), flush=True)


if __name__ == "__main__":
    main()
