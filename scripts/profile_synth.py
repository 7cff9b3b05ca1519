"""Per-stage on-chip timing of the main synth pipeline (bench.py headline).

Chained-iteration timing inside one jit (per verify notes): per-call
timings through the tunneled runtime lie. Stage subsets are selected via
``_synth_core``'s static ``stages`` tuple so each measurement is the real
compiled composition (vmapped over the bench batch of 4), not an isolated
stage with different layouts.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from fetalsyngen_tpu.generator.config import GeneratorCfg, IntensityCfg
from fetalsyngen_tpu.generator import pipeline as pp
from fetalsyngen_tpu.parallel.input_pipeline import _production_scopes
from fetalsyngen_tpu.testing import phantom_seeds_and_seg

SHAPE = (256, 256, 256)
B = 4
ITERS = 4


def make_cfg():
    labels = tuple([0] + list(range(10, 50)))
    gen_classes = tuple([0] + [10] * 10 + [20] * 10 + [30] * 10 + list(range(40, 50)))
    return GeneratorCfg(
        shape=SHAPE,
        resolution=(0.5, 0.5, 0.5),
        intensity=IntensityCfg(1, 6, labels, gen_classes),
    )


def timed(name, stages):
    cfg = make_cfg()

    @jax.jit
    def chain(key, seeds, segs):
        def core(k, sd, sg):
            with _production_scopes():
                out, sg2, _, _ = pp._synth_core(
                    k, sd, sg, jnp.zeros((), jnp.float32), (), cfg, (), False,
                    stages=stages,
                )
            return out.astype(jnp.float32), sg2

        def body(i, carry):
            key, acc = carry
            keys = jax.random.split(key, B + 1)
            out, sg2 = jax.vmap(core)(keys[1:], seeds, segs)
            probe = jnp.mean(out) + jnp.float32(jnp.sum(sg2[0, ::64, ::64, ::64])) * 0.0
            return keys[0], acc + probe

        _, acc = jax.lax.fori_loop(0, ITERS, body, (key, jnp.float32(0)))
        return acc

    seeds_np, seg_np = phantom_seeds_and_seg(SHAPE)
    seeds = jnp.broadcast_to(jnp.asarray(seeds_np, jnp.int32), (B, *SHAPE))
    segs = jnp.broadcast_to(jnp.asarray(seg_np, jnp.int32), (B, *SHAPE))
    key = jax.random.PRNGKey(0)
    float(chain(key, seeds, segs))  # compile + upload
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(key, seeds, segs))
        best = min(best, (time.perf_counter() - t0) / (ITERS * B))
    print(f"{name:34s} {best * 1e3:8.2f} ms/vol")
    return best


def main():
    full = timed("full (intensity+deform+augment)", pp.STAGES_ALL)
    i = timed("intensity only", ("intensity",))
    i_d = timed("intensity+deform", ("intensity", "deform"))
    i_a = timed("intensity+augment", ("intensity", "augment"))
    print(f"{'-> deform (i+d - i)':34s} {(i_d - i) * 1e3:8.2f} ms")
    print(f"{'-> augment (i+a - i)':34s} {(i_a - i) * 1e3:8.2f} ms")
    print(f"{'-> full - i+d':34s} {(full - i_d) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
