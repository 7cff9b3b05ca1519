"""Calibrate achievable HBM bandwidth and MXU FLOPs through the timing harness."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def timed(name, fn, *args, gb=None, tf=None):
    @jax.jit
    def chain(key, *a):
        def body(i, acc):
            eps = jax.random.uniform(jax.random.fold_in(key, i), ()) * 1e-6
            r = fn(a[0] + eps, *a[1:])
            return acc + jnp.sum(r)

        return jax.lax.fori_loop(0, 8, body, 0.0)

    key = jax.random.PRNGKey(0)
    float(chain(key, *args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(key, *args))
        best = min(best, (time.perf_counter() - t0) / 8)
    extra = ""
    if gb:
        extra = f"  ({gb / best:6.0f} GB/s)"
    if tf:
        extra = f"  ({tf / best / 1e3:6.1f} TFLOP/s)"
    print(f"{name:40s} {best * 1e3:8.2f} ms/fire{extra}")
    return best


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((384, 384, 384), np.float32))
    xb = x.astype(jnp.bfloat16)
    A = jnp.asarray(rng.random((8192, 8192), np.float32)).astype(jnp.bfloat16)
    B = jnp.asarray(rng.random((8192, 8192), np.float32)).astype(jnp.bfloat16)

    n = 384**3
    # body already does +eps (r+w) and sum (r): gb accounts the whole body
    timed("eltwise x*1.0001 f32 (384^3)", lambda v: v * 1.0001, x, gb=4 * n * 4 / 1e9)
    timed("transpose (0,2,1) f32", lambda v: jnp.transpose(v, (0, 2, 1)), x, gb=4 * n * 4 / 1e9)
    timed("transpose (2,1,0) f32", lambda v: jnp.transpose(v, (2, 1, 0)), x, gb=4 * n * 4 / 1e9)
    timed(
        "matmul 8192^3 bf16",
        lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32),
        A,
        B,
        tf=2 * 8192**3 / 1e9,
    )


if __name__ == "__main__":
    main()
