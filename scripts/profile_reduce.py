"""Isolate the cost of the block-bounds masked min/max reduce forms."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

D = H = S = 384
R = D * H
B = 64
LB = 384
_BIG = 1e9


def timed(name, fn, *args):
    @jax.jit
    def chain(key, *a):
        def body(i, acc):
            eps = jax.random.uniform(jax.random.fold_in(key, i), ()) * 1e-6
            r = fn(*[x + eps if isinstance(x, jnp.ndarray) else x for x in a])
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


def gen_rel(lt):
    ri = jax.lax.broadcasted_iota(jnp.float32, (D, H, S), 0)
    rj = jax.lax.broadcasted_iota(jnp.float32, (D, H, S), 1)
    lanes = jax.lax.broadcasted_iota(jnp.float32, (D, H, S), 2)
    pos = 0.3 + lanes + lt[0][None, None, :] * ri + lt[1][None, None, :] * rj + lt[2][None, None, :]
    inc = jnp.logical_and(pos > -0.05, pos < S - 0.95)
    return pos - lanes, inc


def v_current(lt):
    rel, inc = gen_rel(lt)
    r4 = rel.reshape(R // B, B, 1, LB)
    i4 = inc.reshape(r4.shape)
    mn = jnp.min(jnp.where(i4, r4, _BIG), axis=(1, 3))
    mx = jnp.max(jnp.where(i4, r4, -_BIG), axis=(1, 3))
    return mn, mx


def v_flat(lt):
    rel, inc = gen_rel(lt)
    r2 = rel.reshape(R // B, B * LB)
    i2 = inc.reshape(r2.shape)
    mn = jnp.min(jnp.where(i2, r2, _BIG), axis=1)
    mx = jnp.max(jnp.where(i2, r2, -_BIG), axis=1)
    return mn, mx


def v_lanes_then_rows(lt):
    rel, inc = gen_rel(lt)
    mn = jnp.min(jnp.where(inc, rel, _BIG), axis=2).reshape(R // B, B).min(axis=1)
    mx = jnp.max(jnp.where(inc, rel, -_BIG), axis=2).reshape(R // B, B).max(axis=1)
    return mn, mx


def v_min_only(lt):
    rel, inc = gen_rel(lt)
    r2 = rel.reshape(R // B, B * LB)
    i2 = inc.reshape(r2.shape)
    return jnp.min(jnp.where(i2, r2, _BIG), axis=1)


def v_gen_only(lt):
    rel, inc = gen_rel(lt)
    return jnp.sum(rel.reshape(R // B, B * LB)[:, ::LB], axis=1) + jnp.sum(inc.reshape(R // B, B * LB)[:, ::LB], axis=1)


def v_negstack(lt):
    rel, inc = gen_rel(lt)
    both = jnp.stack([jnp.where(inc, rel, _BIG), jnp.where(inc, -rel, _BIG)], 0)
    m = jnp.min(both.reshape(2, R // B, B * LB), axis=2)
    return m[0], -m[1]


def main():
    rng = np.random.default_rng(0)
    lt = jnp.asarray(rng.normal(0, 0.02, (3, S)).astype(np.float32))
    timed("gen only (strided sum)", v_gen_only, lt)
    timed("current (axis 1,3)", v_current, lt)
    timed("flat (axis 1)", v_flat, lt)
    timed("lanes then rows", v_lanes_then_rows, lt)
    timed("min only flat", v_min_only, lt)
    timed("neg-stack single min", v_negstack, lt)


if __name__ == "__main__":
    main()
