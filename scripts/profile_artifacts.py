"""Per-stage on-chip timing of the traced artifact chain.

Times each stream artifact (gate forced ON) by chaining ITERS invocations
inside one jitted fori_loop and fetching a scalar — per-call timings through
the tunneled runtime lie (see .claude/skills/verify/SKILL.md). Prints one
line per stage; run on the real chip.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from fetalsyngen_tpu.config import instantiate, load_yaml, resolve_interpolations
from fetalsyngen_tpu.generator.artifacts import batched as bt
from fetalsyngen_tpu.parallel.input_pipeline import _production_scopes

SHAPE = (256, 256, 256)
ITERS = 8


def timed(name, fn, *args):
    """fn(key, out, *args) -> out; chained ITERS times inside one jit."""

    @jax.jit
    def chain(key, out):
        def body(i, o):
            with _production_scopes():
                o = fn(jax.random.fold_in(key, i), o, *args)
            return o

        return jax.lax.fori_loop(0, ITERS, body, out)

    key = jax.random.PRNGKey(0)
    out = jnp.asarray(np.random.default_rng(0).random(SHAPE, np.float32))
    r = chain(key, out)
    float(jnp.sum(r[::64, ::64, ::64]))  # compile + upload
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = chain(key, out)
        float(jnp.sum(r[::64, ::64, ::64]))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:28s} {best * 1e3:8.2f} ms/fire")
    return best


def main():
    gen_cfg = resolve_interpolations(load_yaml("configs/dataset/generator/default.yaml"))
    gen_cfg["shape"] = list(SHAPE)
    gen_cfg["spatial_deform"]["size"] = list(SHAPE)
    gen = instantiate(gen_cfg)
    qa = bt.QualityArtifacts.from_generator(gen)
    sm = gen.artifacts["simulate_motion"]

    seg = jnp.asarray(
        (np.linalg.norm(np.indices(SHAPE) - 128, axis=0) < 80).astype(np.int32)
    )
    # force every gate ON
    for o in (qa.blur_cortex, qa.struct_noise, qa.boundaries):
        if o is not None:
            o.prob = 1.0
            if hasattr(o, "prob_no_mask"):
                o.prob_no_mask = 0.0
                o.prob_halo = 1.0
                o.prob_fuzzy = 1.0
    sm.prob = 1.0

    timed("blur_cortex", lambda k, o: bt.blur_cortex_t(k, o, seg, qa.blur_cortex))
    timed("struct_noise", lambda k, o: bt.struct_noise_t(k, o, seg, qa.struct_noise))
    timed("boundaries(halo+fuzzy)", lambda k, o: bt.boundaries_t(k, o, seg, qa.boundaries))

    cube, ns_grid = 384, 128
    small = 256
    rng = np.random.default_rng(0)

    def motion_timed(name, small_cube, want_small):
        # pack single-sample geometry rows until the small flag matches
        for _ in range(200):
            pack = bt.pack_motion(rng, 1, SHAPE, 0.5, sm, cube, ns_grid, small_cube=small_cube)
            if bool(pack["small"][0]) == want_small:
                break
        row = jax.tree.map(lambda a: jnp.asarray(a)[0], pack)
        timed(
            name,
            lambda k, o: bt.motion_t(k, o, seg, row, sm, SHAPE, cube, ns_grid, small_cube=small_cube),
        )

    motion_timed("motion big(384)", None, False)
    motion_timed("motion small(256)", small, True)


if __name__ == "__main__":
    main()
