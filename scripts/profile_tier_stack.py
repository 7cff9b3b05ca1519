"""Per-tier on-chip cost of one motion stack (acquire + recon).

Times the full single-stack chain (`_acquire_one` fast mode + `_recon_one`)
at each grid tier with REAL pack_motion geometry, under the stream's
production scopes — the per-stack cost model behind the multi-tier stream's
throughput. Chained-iteration timing inside one jit.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from fetalsyngen_tpu.config import instantiate, load_yaml, resolve_interpolations
from fetalsyngen_tpu.generator.artifacts import batched as ba
from fetalsyngen_tpu.generator.artifacts import scanner as sc
from fetalsyngen_tpu.parallel.input_pipeline import _production_scopes

SHAPE = (256, 256, 256)
NSG = 96


def stack_fn(cube, row, st, sp, shape, split_dz=False):
    def fn(key, vol, seg):
        vol_p = sc._pad_centered(vol, cube)
        cmask = sc._coarse_mask(sc._pad_centered((seg > 0).astype(jnp.float32), cube))
        slices, valid = sc._acquire_one(
            vol_p, None, st["q_idx"], st["angles"], st["wscale"], st["wdelta"],
            st["G"], row["rs"], row["gap_vox"], row["z0"], row["sig"],
            st["scal"][0], row["ns"], key, st["scal"][1], st["scal"][2] > 0.5,
            st["scal"][3], sp.prob_void, sp.slice_noise_threshold, cube, NSG,
            coarse_mask=cmask, split_dz=split_dz,
        )
        v, w = sc._recon_one(
            slices, valid, st["Grec"], row["rs"], row["gap_vox"], row["z0"],
            row["sig_rec"], st["qinv"], st["iang"], st["iscl"], st["idlt"],
            cube, NSG, shape, split_dz=split_dz,
        )
        return v, w

    return fn


def timed(name, fn, *args):
    @jax.jit
    def chain(key, *a):
        def body(i, acc):
            ki = jax.random.fold_in(key, i)
            with _production_scopes():
                r = fn(ki, *a)
            return acc + sum(jnp.sum(x) for x in jax.tree.leaves(r))

        return jax.lax.fori_loop(0, 8, body, 0.0)

    key = jax.random.PRNGKey(0)
    float(chain(key, *args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(key, *args))
        best = min(best, (time.perf_counter() - t0) / 8)
    print(json.dumps({"stage": name, "ms": round(best * 1e3, 2)}), flush=True)
    return best


def main():
    gen_cfg = resolve_interpolations(load_yaml("configs/dataset/generator/default.yaml"))
    generator = instantiate(gen_cfg)
    sm = generator.artifacts["simulate_motion"]
    sp = sm.scanner_args
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random(SHAPE, np.float32))
    seg = jnp.asarray(
        (np.linalg.norm(np.indices(SHAPE) - 128.0, axis=0) < 80).astype(np.int32)
    )

    tiers = (384, 512, 640)
    pack = ba.pack_motion(rng, 48, SHAPE, 0.5, sm, tiers, NSG)
    for cube in tiers:
        # pick a motion-ON sample routed to this tier
        ti = tiers.index(cube)
        cand = np.nonzero(pack["motion_on"] & (pack["tier_idx"] == ti))[0]
        if not len(cand):
            print(json.dumps({"stage": f"tier{cube}", "ms": None, "note": "no draw"}))
            continue
        b = int(cand[0])
        row = {
            k: jnp.asarray(pack[k][b])
            for k in ("rs", "gap_vox", "z0", "ns", "sig", "sig_rec")
        }
        st = {
            k: jnp.asarray(pack[k][b][0])
            for k in ("q_idx", "angles", "wscale", "wdelta", "G", "Grec", "scal",
                      "qinv", "iang", "iscl", "idlt")
        }
        for split in (False, True):
            tag = f"tier{cube}" + ("_dzsplit" if split else "")
            timed(tag, stack_fn(cube, row, st, sp, SHAPE, split), vol, seg)


if __name__ == "__main__":
    main()
