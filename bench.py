"""Throughput benchmark: randomized 256^3 image+label volumes per second per chip.

Prints the throughput JSON line immediately after the timed chain (crash
insurance — a latency-probe failure must not zero the perf record, which is
how round 4 lost its number), then the final merged line
{"metric", "value", "unit", "vs_baseline", "latency_p50_s", ...} — the
driver parses the LAST JSON line of the output.

Baseline: the reference reports 0.56-0.62 s per volume on an (unspecified)
CUDA GPU (`/root/reference/docs/datasets.md:76,131`), i.e. ~1.78 vol/s/GPU
(BASELINE.md). vs_baseline = our vol/s/chip divided by 1.78.

Timing methodology: every iteration is chained through a data dependency
inside one jitted fori_loop and only a scalar is fetched, so the measurement
is device-side wall time (host-side `block_until_ready` is not reliable on
tunneled platforms). The tunnel adds a ~20 ms CONSTANT per dispatch+fetch
round trip (measured: an elementwise pass sweeps 118 -> 832 GB/s as the chain
grows 6 -> 96 iterations), so the default chain length (24 iterations x batch
4 = 96 volumes) is sized to amortize it below ~2% of the reading; a
production user on a local chip never pays that constant.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

# The env var above is a no-op on hosts whose sitecustomize imports jax at
# interpreter start (config already frozen) — set it explicitly so the
# multi-minute 256^3 pipeline compile persists across bench invocations.
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # sitecustomize may force-register the TPU plugin and overwrite
    # jax_platforms; honor an explicit CPU request (smoke runs) BEFORE any
    # backend init — with the tunnel down, axon init blocks forever.
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

REFERENCE_VOLS_PER_SEC = 1.78


def bench_artifacts(shape_edge: int, samples: int):
    """Wall-clock seconds/sample for the 4-artifact SR pipeline at
    ``shape_edge``^3 (host-orchestrated path; includes dispatch overhead —
    that's what a user pays). Reference path: ``simulate_reco.py:300-466``."""
    import numpy as np

    from fetalsyngen_tpu.config import load_yaml, resolve_interpolations, instantiate

    gen_cfg = resolve_interpolations(load_yaml("configs/dataset/generator/default.yaml"))
    # enable all four SR artifacts with the YAML-default parameters
    for k in ("blur_cortex", "struct_noise", "simulate_motion", "boundaries"):
        assert k in gen_cfg, f"missing artifact {k} in default.yaml"
    shape = (shape_edge,) * 3
    gen_cfg["shape"] = list(shape)
    gen_cfg["spatial_deform"]["size"] = list(shape)
    generator = instantiate(gen_cfg)

    from fetalsyngen_tpu.testing import phantom_seeds_and_seg

    _, seg_np = phantom_seeds_and_seg(shape)
    from scipy.ndimage import gaussian_filter

    out = gaussian_filter(
        (seg_np > 0).astype(np.float32) * 100 + (seg_np > 2) * 80, 1.5
    ).astype(np.float32)

    out_dev = jnp.asarray(out)
    seg_dev = jnp.asarray(seg_np.astype(np.int32))  # on device, like the
    # production path (model.sample hands the artifacts the jitted
    # pipeline's device seg, model.py:377-380)

    def one(i):
        key = jax.random.PRNGKey(100 + i)
        rng = np.random.default_rng(100 + i)
        o = out_dev
        for name, artifact in generator.artifacts.items():
            if artifact is None:
                continue
            akey = jax.random.fold_in(key, hash(name) % 1000)
            o, _ = artifact(
                o, seg_dev, resolution=(0.5, 0.5, 0.5),
                rng=np.random.default_rng(rng.integers(2**31)), key=akey,
            )
        return float(jnp.sum(o[::64, ::64, ::64]))  # device sync

    # warmup on a DISJOINT index range (2x as many draws), so the timed
    # samples are fresh draws, not replays of pre-compiled exact sequences.
    # Host-branch program variants (artifact gates, merge types, cube tiers)
    # are still expected to be compiled by the warmup / the persistent cache;
    # a timed draw that hits a brand-new variant pays its compile — that is
    # what a production user pays too.
    for i in range(samples + 1, 3 * samples + 1):
        one(i)
    t0 = time.perf_counter()
    for i in range(1, samples + 1):
        one(i)
    sec = (time.perf_counter() - t0) / samples
    print(
        json.dumps(
            {
                "metric": (
                    f"SR-artifact pipeline {shape_edge}^3 sec/sample "
                    "(vs_baseline = speedup vs this repo's round-1 48 s/sample "
                    "self-baseline; the reference publishes no artifact-path number)"
                ),
                "value": round(sec, 3),
                "unit": "s/sample",
                "vs_baseline": round(48.0 / sec, 3),
            }
        )
    )


def bench_stream(shape_edge: int, batch: int, iters: int, artifacts: bool = True):
    """End-to-end production path: BIDS tree on disk -> native IO -> device
    seed banks -> jitted batched generation + the default-probability
    SR-artifact chain (``SyntheticStream``), wall-clock volumes/sec/chip
    including all host work. ``artifacts=False`` reproduces the artifact-free
    core-pipeline number."""
    import tempfile
    from pathlib import Path

    import numpy as np

    from fetalsyngen_tpu.data.datasets import FetalSynthDataset
    from fetalsyngen_tpu.io import nifti
    from fetalsyngen_tpu.parallel.input_pipeline import SyntheticStream
    from fetalsyngen_tpu.testing import phantom_seeds_and_seg

    shape = (shape_edge,) * 3
    root = Path(tempfile.mkdtemp(prefix="fsg_bench_bids_"))
    rng = np.random.default_rng(0)
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

    if artifacts:
        # the FULL default generator incl. the 4 SR artifacts at their YAML
        # default probabilities — the reference's dataset path applies them
        # inside sample (fetalsyngen/generator/model.py:210-220)
        from fetalsyngen_tpu.config import load_yaml, resolve_interpolations, instantiate

        gen_cfg = resolve_interpolations(
            load_yaml("configs/dataset/generator/default.yaml")
        )
        gen_cfg["shape"] = list(shape)
        gen_cfg["spatial_deform"]["size"] = list(shape)
        generator = instantiate(gen_cfg)
    else:
        import __graft_entry__ as ge

        generator_cfg = ge._default_cfg(shape)
        # dataset needs a FetalSynthGen-like object exposing .cfg
        class _Gen:
            cfg = generator_cfg
            artifacts = {}

        generator = _Gen()

    ds = FetalSynthDataset(str(root), generator, str(root / "derivatives" / "seeds"))
    stream = SyntheticStream(ds, batch_size=batch, seed=0, prefetch=True)
    it = iter(stream)

    # warmup: compile + BOTH subjects' seed banks uploaded (the stream
    # round-robins subjects, so one warmup batch leaves the second subject's
    # bank transfer inside the timed region)
    for _ in range(2):
        b = next(it)
        float(jnp.sum(b["image"][..., ::64, ::64, ::64]))
    t0 = time.perf_counter()
    for _ in range(iters):
        b = next(it)
        float(jnp.sum(b["image"][..., ::64, ::64, ::64]))
    dt = time.perf_counter() - t0
    vols = batch * iters / dt
    tag = "+artifacts" if artifacts else ""
    print(
        json.dumps(
            {
                "metric": f"end-to-end stream{tag} {shape_edge}^3 volumes/sec/chip",
                "value": round(vols, 4),
                "unit": "vol/s/chip",
                "vs_baseline": round(vols / REFERENCE_VOLS_PER_SEC, 4),
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--artifacts", action="store_true", help="bench the SR-artifact pipeline")
    ap.add_argument("--stream", action="store_true", help="bench the end-to-end input stream")
    ap.add_argument(
        "--no-artifacts", action="store_true",
        help="with --stream: disable the SR-artifact chain (core pipeline only)",
    )
    ap.add_argument("--samples", type=int, default=3)
    args = ap.parse_args()

    if args.artifacts:
        bench_artifacts(args.shape, args.samples)
        return
    if args.stream:
        bench_stream(args.shape, args.batch, args.iters, artifacts=not args.no_artifacts)
        return

    from fetalsyngen_tpu.generator.config import GeneratorCfg, IntensityCfg
    from fetalsyngen_tpu.generator.pipeline import _synth_core
    from fetalsyngen_tpu.testing import phantom_seeds_and_seg

    shape = (args.shape,) * 3
    labels = tuple([0] + list(range(10, 50)))
    gen_classes = tuple([0] + [10] * 10 + [20] * 10 + [30] * 10 + list(range(40, 50)))
    cfg = GeneratorCfg(
        shape=shape,
        resolution=(0.5, 0.5, 0.5),
        intensity=IntensityCfg(1, 6, labels, gen_classes),
    )

    seeds_np, seg_np = phantom_seeds_and_seg(shape)
    B = args.batch
    seeds = jnp.broadcast_to(jnp.asarray(seeds_np, jnp.int32), (B, *shape))
    segs = jnp.broadcast_to(jnp.asarray(seg_np, jnp.int32), (B, *shape))

    from fetalsyngen_tpu.parallel.input_pipeline import _production_scopes

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(key, seeds, segs, iters):
        # production generation mode: single-pass bf16 MXU + bf16
        # intermediate storage (the stream path, input_pipeline._gen_batch,
        # generates with the same scopes; FSG_STREAM_BF16=0 reverts to the
        # f32 contract). Replay-faithful host sampling stays f32;
        # tests/test_pipeline.py pins bf16-vs-f32 quality (seg voxel-exact,
        # image corr).
        def core(k, sd, sg):
            with _production_scopes():
                out, seg, _, _ = _synth_core(
                    k, sd, sg, jnp.zeros((), jnp.float32), (), cfg, (), False
                )
            return out.astype(jnp.float32), seg

        def body(i, carry):
            key, acc = carry
            keys = jax.random.split(key, B + 1)
            out, seg = jax.vmap(core)(keys[1:], seeds, segs)
            probe = jnp.mean(out) + jnp.float32(jnp.sum(seg[0, ::64, ::64, ::64])) * 0.0
            return keys[0], acc + probe

        _, acc = jax.lax.fori_loop(0, iters, body, (key, jnp.float32(0)))
        return acc

    # warmup / compile (same trip count as the timed call so the timed
    # region contains zero compilation)
    float(chain(jax.random.PRNGKey(0), seeds, segs, args.iters))

    t0 = time.perf_counter()
    float(chain(jax.random.PRNGKey(1), seeds, segs, args.iters))
    dt = time.perf_counter() - t0

    vols_per_sec = B * args.iters / dt

    # Print the headline throughput IMMEDIATELY — before the optional latency
    # probe — so a probe-side failure can never zero the round's perf record
    # (round 4 lost its number exactly this way: BENCH_r04.json rc=1).
    result = {
        "metric": f"randomized {args.shape}^3 volumes/sec/chip",
        "value": round(vols_per_sec, 4),
        "unit": "vol/s/chip",
        "vs_baseline": round(vols_per_sec / REFERENCE_VOLS_PER_SEC, 4),
    }
    print(json.dumps(result), flush=True)

    # --- single-volume generation latency p50 (the second half of
    # BASELINE.json's metric): one dispatch+fetch per volume, timed
    # individually on the host. Includes the per-dispatch round-trip
    # (~20 ms constant through the tunneled runtime — a local chip pays
    # less); the chained number above is the amortized device-side rate.
    #
    # seeds/segs are passed as ARGUMENTS, never closed over: a closed-over
    # 256^3 int32 array is baked into the serialized HLO as a literal and
    # the remote-compile upload blows the tunnel's body limit (the round-4
    # HTTP 413). Wrapped in try/except for the same reason: one
    # compile-service failure must not kill the record.
    @jax.jit
    def single(key, seed1, seg1):
        with _production_scopes():
            out, seg, _, _ = _synth_core(
                key, seed1, seg1, jnp.zeros((), jnp.float32), (), cfg, (), False
            )
        return jnp.mean(out.astype(jnp.float32)) + jnp.float32(
            jnp.sum(seg[::64, ::64, ::64])
        ) * 0.0

    try:
        lat_n = 15
        for i in range(3):  # compile + program-upload warmup
            float(single(jax.random.PRNGKey(1000 + i), seeds[0], segs[0]))
        lats = []
        for i in range(lat_n):
            t0 = time.perf_counter()
            float(single(jax.random.PRNGKey(2000 + i), seeds[0], segs[0]))
            lats.append(time.perf_counter() - t0)
        lat_p50 = sorted(lats)[lat_n // 2]
        result["latency_p50_s"] = round(lat_p50, 4)
        result["latency_note"] = (
            "single-volume dispatch+fetch p50 over "
            f"{lat_n} draws incl ~20 ms tunnel round-trip; reference "
            "reports 0.56-0.62 s (docs/datasets.md:76,131)"
        )
    except Exception as e:  # pragma: no cover - depends on compile service
        result["latency_p50_s"] = None
        result["latency_note"] = f"latency probe failed: {type(e).__name__}: {e}"

    # Final merged line (throughput + latency). The driver parses the last
    # JSON line of the tail; the early print above is crash insurance.
    print(json.dumps(result))


if __name__ == "__main__":
    main()
