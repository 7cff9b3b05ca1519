"""Time _block_bounds (XLA precompute) vs the full hat_pass on TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from fetalsyngen_tpu.ops import warp

CUBE = 384


def timed(name, fn, *args):
    @jax.jit
    def chain(key, *a):
        def body(i, acc):
            eps = jax.random.uniform(jax.random.fold_in(key, i), ()) * 1e-6
            r = fn(*[x + eps if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 and x.ndim >= 2 else x for x in a])
            return acc + sum(jnp.sum(x) for x in jax.tree.leaves(r))

        return jax.lax.fori_loop(0, 8, body, 0.0)

    key = jax.random.PRNGKey(0)
    float(chain(key, *args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(key, *args))
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"{name:44s} {best * 1e3:8.2f} ms/fire")
    return best


def main():
    rng = np.random.default_rng(0)
    D = H = S = CUBE
    R = D * H
    vol = jnp.asarray(rng.random((D, H, S), np.float32))
    lt = jnp.asarray(rng.normal(0, 0.02, (3, S)).astype(np.float32))
    coefs = jnp.asarray(np.array([0.0, 0.0, 1.0, 0.3], np.float32))

    # bounds precompute alone (lane-affine dz-style pass, LB = S)
    timed(
        "_block_bounds lane-affine LB=384",
        lambda lt_: warp._block_bounds(coefs, False, lt_, True, R, S, H, S, S),
        lt,
    )
    timed(
        "_block_bounds no-disp LB=128",
        lambda c: warp._block_bounds(c, False, None, False, R, S, H, S, 128),
        coefs,
    )
    timed(
        "hat_pass dz unit-slope lane-affine",
        lambda v, lt_: warp.hat_pass(v, (0.0, 0.0, 1.0, 0.3), lt_, (D, H, S), 48, False, unit_slope=True),
        vol,
        lt,
    )


if __name__ == "__main__":
    main()
