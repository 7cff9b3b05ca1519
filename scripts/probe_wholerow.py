"""On-chip Mosaic-vs-fallback probe of the whole-row lane-block widths.

Round-5 diagnostic: with the saturated-lane bounds exclusion in place,
re-test whether the 512/640 whole-row configurations are exact on REAL
production-tier scanner geometry (the earlier failures traced to empty-lane
interval inflation, which the exclusion removes, plus a genuine-spread
component bounded by ~2x the deviation range).

Usage: python scripts/probe_wholerow.py [--max 640]
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests_tpu"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from test_production_tiers import _pinned_pack, _chain_jit, SHAPE
from fetalsyngen_tpu.generator.artifacts import scanner as sc
from fetalsyngen_tpu.ops import warp as W
from fetalsyngen_tpu.config import instantiate, load_yaml, resolve_interpolations


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max", type=int, default=640)
    args = ap.parse_args()

    gen_cfg = resolve_interpolations(load_yaml("configs/dataset/generator/default.yaml"))
    sm = instantiate(gen_cfg).artifacts["simulate_motion"]
    sp = sm.scanner_args
    rng = np.random.default_rng(0)
    c = np.linalg.norm(np.indices(SHAPE) - 128.0, axis=0)
    seg = (c < 80).astype(np.int32)
    out = (seg * (60 + 40 * rng.random(SHAPE))).astype(np.float32)
    out, seg = jnp.asarray(out), jnp.asarray(seg)

    W.WHOLE_ROW_MAX = args.max
    jax.clear_caches()
    for pin, cube in ((0.35, 512), (0.26, 640)):
        pack = _pinned_pack(sm, pin, B=4, seed=0)
        pd = jax.tree.map(jnp.asarray, pack)
        for b in (0, 1):
            row = jax.tree.map(lambda a: a[b], pd)
            st = {
                k: row[k][0]
                for k in ("q_idx", "angles", "wscale", "wdelta", "G", "Grec",
                          "scal", "qinv", "iang", "iscl", "idlt")
            }
            vol_p = sc._pad_centered(out.astype(jnp.float32), cube)
            cmask = sc._coarse_mask(
                sc._pad_centered((seg > 0).astype(jnp.float32), cube)
            )
            row_s = {k: row[k] for k in ("rs", "gap_vox", "z0", "sig", "sig_rec", "ns")}
            v0, w0 = _chain_jit(vol_p, cmask, st, row_s, sp.prob_void,
                                sp.slice_noise_threshold, cube, False)
            with W.force_jnp_fallback():
                v0f, w0f = _chain_jit(vol_p, cmask, st, row_s, sp.prob_void,
                                      sp.slice_noise_threshold, cube, False)
            a0, wa, a1, wb = map(np.asarray, (v0, w0, v0f, w0f))
            m = wa > 0.1
            r0 = a0[m] / np.maximum(wa[m], 1e-6)
            r1 = a1[m] / np.maximum(wb[m], 1e-6)
            err = np.abs(r0 - r1)
            print(
                f"wholerow<={args.max} cube={cube} b={b}: "
                f"p99.9={float(np.quantile(err, 0.999)):.5f} "
                f"max={float(err.max()):.4f} "
                f"w_err_max={float(np.abs(wa - wb).max()):.6f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
