"""Microbenchmark the warp hot path on the real TPU.

Times individual ops with the chained-fori_loop methodology (device-side
time; host block_until_ready is unreliable on tunneled platforms).

Usage: python scripts/microbench_warp.py --variant pair_l --iters 50
"""

from __future__ import annotations

import argparse
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters):
    """fn must map carry -> carry (same pytree shape). Returns sec/iter."""

    @jax.jit
    def chain(c):
        return jax.lax.fori_loop(0, iters, lambda i, c: fn(c), c)

    out = chain(*args)
    probe = float(jnp.sum(jax.tree.leaves(out)[0][..., ::64, ::64]))  # sync
    t0 = time.perf_counter()
    out = chain(*args)
    probe = float(jnp.sum(jax.tree.leaves(out)[0][..., ::64, ::64]))
    dt = time.perf_counter() - t0
    return dt / iters, probe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    from fetalsyngen_tpu.ops import warp as W

    S = args.size
    B = args.batch
    shape = (S, S, S)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, *shape)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, *shape)), jnp.float32)
    d = jnp.asarray(rng.uniform(-8, 8, size=(B, *shape)), jnp.float32)

    v = args.variant

    if v == "pair_l":  # L-type pass with disp (field pass)
        fn = jax.vmap(
            lambda a, b, dd: W.hat_pass_pair(
                a, b, (0.11, 0.07, 1.0, 0.3), dd, shape, W.MAXSPAN_FIELD
            )
        )
        sec, _ = timeit(lambda c: (*fn(c[0], c[1], c[2])[:2], c[2]), (x, y, d), iters=args.iters)
    elif v == "pair_l_nodisp":  # plain L pass
        fn = jax.vmap(
            lambda a, b: W.hat_pass_pair(a, b, (0.11, 0.07, 1.0, 0.3), None, shape, W.MAXSPAN_L)
        )
        sec, _ = timeit(lambda c: fn(c[0], c[1]), (x, y), iters=args.iters)
    elif v == "pair_u":  # U pass (non-unit slope)
        fn = jax.vmap(
            lambda a, b: W.hat_pass_pair(a, b, (0.05, 0.1, 1.08, -9.0), None, shape, W.MAXSPAN_U)
        )
        sec, _ = timeit(lambda c: fn(c[0], c[1]), (x, y), iters=args.iters)
    elif v == "single_l":
        fn = jax.vmap(
            lambda a, dd: W.hat_pass(a, (0.11, 0.07, 1.0, 0.3), dd, shape, W.MAXSPAN_FIELD, False)
        )
        sec, _ = timeit(lambda c: (fn(c[0], c[1]), c[1]), (x, d), iters=args.iters)
    elif v == "transpose":
        fn = lambda a: jnp.transpose(a, (0, 1, 3, 2)) + 0.0
        sec, _ = timeit(lambda c: fn(c), x, iters=args.iters)
    elif v == "transpose_bf16":
        xb = x.astype(jnp.bfloat16)
        fn = lambda a: jnp.transpose(a, (0, 1, 3, 2)) + jnp.bfloat16(0.0)
        sec, _ = timeit(lambda c: fn(c), xb, iters=args.iters)
    elif v == "transpose_rows":  # leading-dims swap (row permutation, lanes kept)
        fn = lambda a: jnp.transpose(a, (0, 2, 1, 3)) + 0.0
        sec, _ = timeit(lambda c: fn(c), x, iters=args.iters)
    elif v in ("pair_l_unit", "pair_l_unit_bf16", "pair_l_unit_zero", "pair_l_unit_smooth"):
        # the REAL pipeline L pass; _zero = no-op field (minimal span),
        # _smooth = realistic upsampled low-res field
        from fetalsyngen_tpu.ops.linops import storage_scope

        if v.endswith("zero"):
            d = jnp.zeros_like(d)
        elif v.endswith("smooth"):
            from fetalsyngen_tpu.ops.linops import zoom_mm

            sm = 12
            small = jnp.asarray(rng.normal(size=(B, sm, sm, sm)) * 4.0, jnp.float32)
            factor = jnp.full((3,), S / sm, jnp.float32)
            d = jax.vmap(lambda f: zoom_mm(f, shape, factor))(small)
        store = jnp.bfloat16 if v.endswith("bf16") else None
        with storage_scope(store):
            fn = jax.vmap(
                lambda a, b, dd: W.hat_pass_pair(
                    a, b, (0.11, 0.07, 1.0, 0.3), dd, shape, W.MAXSPAN_FIELD,
                    unit_slope=True,
                )
            )

            def step(c):
                oa, ob = fn(c[0], c[1], c[2])
                return oa.astype(jnp.float32), ob.astype(jnp.float32), c[2]

            sec, _ = timeit(step, (x, y, d), iters=args.iters)
    elif v in ("u_stage", "u_stage_bf16"):  # the 4-matmul U stage of the pair warp
        from fetalsyngen_tpu.ops.linops import storage_scope

        store = jnp.bfloat16 if v.endswith("bf16") else None
        modes = (False, True)
        with storage_scope(store):

            def one(a, b):
                a, b = W._row_affine_matmul_pair(a, b, 1.08, 0.0, 0.3, modes, out_order="ikj")
                a, b = W._row_affine_matmul_pair(a, b, 0.95, 0.06, 0.1, modes, out_order="kji")
                a, b = W._row_affine_matmul_pair(a, b, 1.0, 0.04, 0.0, modes, out_order="jik")
                a, b = W._row_affine_matmul_pair(a, b, 1.02, -0.05, 0.2, modes, out_order="kij")
                return a.astype(jnp.float32), b.astype(jnp.float32)

            fn = jax.vmap(one)
            sec, _ = timeit(lambda c: fn(c[0], c[1]), (x, y), iters=args.iters)
    elif v == "nonlin_field":  # the 3-channel low-res field upsample (f32)
        from fetalsyngen_tpu.ops.linops import zoom_mm

        sm = 10
        f_small = jnp.asarray(rng.normal(size=(B, 3, sm, sm, sm)), jnp.float32)
        factor = jnp.full((3,), S / sm, jnp.float32)
        size_small = jnp.full((3,), sm, jnp.int32)

        def one(fs):
            return jnp.stack(
                [zoom_mm(fs[c], shape, factor, in_shape=size_small) for c in range(3)]
            )

        fn = jax.vmap(one)
        sec, _ = timeit(lambda c: c + jnp.mean(fn(c)) * 1e-20, f_small, iters=args.iters)
    elif v in ("deform_pair_bf16",):  # full fused warp under production scopes
        from fetalsyngen_tpu.ops.linops import storage_scope, precision_scope

        A = jnp.asarray(np.eye(3) + rng.normal(size=(3, 3)) * 0.05, jnp.float32)
        t = jnp.zeros(3, jnp.float32)
        with precision_scope(jax.lax.Precision.DEFAULT), storage_scope(jnp.bfloat16):

            def one(a, b, f):
                oa, ob = W.warp_affine_field_pair(a, b, A, t, f, f, f)
                return oa.astype(jnp.float32), ob.astype(jnp.float32)

            fn = jax.vmap(one)
            sec, _ = timeit(
                lambda c: (*fn(c[0], c[1], c[2]), c[2]), (x, y, d), iters=args.iters
            )
    elif v == "pad":
        R = S * S

        def fn(a):
            p = jnp.pad(a.reshape(B, R, S), ((0, 0), (0, 0), (W.PAD, W.PAD + 128)), mode="edge")
            return p[:, :, W.PAD : W.PAD + S].reshape(B, *shape)

        sec, _ = timeit(lambda c: fn(c), x, iters=args.iters)
    elif v == "deform_pair":  # the full 6-pass fused affine+field warp
        A = jnp.asarray(np.eye(3) + rng.normal(size=(3, 3)) * 0.05, jnp.float32)
        t = jnp.zeros(3, jnp.float32)

        def one(a, b, f):
            oa, ob = W.warp_affine_field_pair(a, b, A, t, f, f, f)
            return oa, ob

        fn = jax.vmap(one)
        sec, _ = timeit(lambda c: (*fn(c[0], c[1], c[2]), c[2]), (x, y, d), iters=args.iters)
    elif v.startswith("probe2_"):
        # Floor probes matching the CURRENT pair-kernel structure at
        # (BR=128, LB=256): copy = raw in->out; stage = edge-padded scratch
        # staging + copy-from-scratch; taps<N> = stage + pos math + N taps.
        import functools as ft

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        BR, LB = int(os.environ.get("PROBE_BR", 128)), 256
        R = S * S
        pad, width, WIN = W._win_geometry(S, LB)
        mode = v[len("probe2_") :]
        ntaps = int(mode[4:]) if mode.startswith("taps") else 0

        def probe_kernel(xa_ref, xb_ref, oa_ref, ob_ref, sa_ref, sb_ref, *, mode):
            if mode == "copy":
                oa_ref[:] = xa_ref[:] * 2.0
                ob_ref[:] = xb_ref[:] * 2.0
                return
            for x_ref, s_ref in ((xa_ref, sa_ref), (xb_ref, sb_ref)):
                xf = x_ref[:]
                s_ref[:, pad : pad + S] = xf
                s_ref[:, :pad] = jnp.broadcast_to(xf[:, :1], (BR, pad))
                s_ref[:, pad + S :] = jnp.broadcast_to(xf[:, S - 1 : S], (BR, width - pad - S))
            if mode == "stage":
                oa_ref[:] = sa_ref[:, pad : pad + S]
                ob_ref[:] = sb_ref[:, pad : pad + S]
                return
            # pos math + N taps via unaligned window slices (the real loop)
            r_blk = pl.program_id(0)
            rows = r_blk * BR + jax.lax.broadcasted_iota(jnp.int32, (BR, LB), 0)
            row_j = (rows % S).astype(jnp.float32)
            lanes_f = jax.lax.broadcasted_iota(jnp.int32, (BR, LB), 1).astype(jnp.float32)
            pos = 0.07 * row_j + lanes_f + 0.3
            n0 = jnp.int32(-1)
            base = pad + n0
            q = base // 128
            off = base - q * 128
            wa = sa_ref[:, pl.ds(pl.multiple_of(q * 128, 128), WIN)]
            wb = sb_ref[:, pl.ds(pl.multiple_of(q * 128, 128), WIN)]
            d0 = pos - lanes_f - n0.astype(jnp.float32) + off.astype(jnp.float32)
            acc_a = jnp.zeros((BR, LB), jnp.float32)
            acc_b = jnp.zeros((BR, LB), jnp.float32)
            for m in range(ntaps):
                wgt = jnp.maximum(0.0, 1.0 - jnp.abs(d0 - float(m)))
                acc_a = acc_a + wgt * wa[:, m : m + LB]
                acc_b = acc_b + wgt * wb[:, m : m + LB]
            oa_ref[:] = acc_a
            ob_ref[:] = acc_b

        call = pl.pallas_call(
            ft.partial(probe_kernel, mode=mode),
            out_shape=(
                jax.ShapeDtypeStruct((R, S), jnp.float32),
                jax.ShapeDtypeStruct((R, S), jnp.float32),
            ),
            grid=(R // BR,),
            in_specs=[
                pl.BlockSpec((BR, S), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, S), lambda r: (r, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((BR, S), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, S), lambda r: (r, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((BR, width), jnp.float32),
                pltpu.VMEM((BR, width), jnp.float32),
            ],
        )

        def one(a, b):
            oa, ob = call(a.reshape(R, S), b.reshape(R, S))
            return oa.reshape(shape), ob.reshape(shape)

        fn = jax.vmap(one)
        sec, _ = timeit(lambda c: fn(c[0], c[1]), (x, y), iters=args.iters)
    elif v.startswith("probe_"):
        # Stripped-down kernels isolating v2 cost components.
        import functools as ft

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        BR, SUBR, PAD = W.BIG_ROWS, W.SUB, W.PAD
        R = S * S
        width = S + 2 * PAD + 128

        def probe_kernel(x_ref, o_ref, s_ref, *, mode):
            if mode == "copy":
                o_ref[:] = x_ref[:] * 2.0
                return
            s_ref[:, PAD : PAD + S] = x_ref[:]
            s_ref[:, :PAD] = jnp.broadcast_to(x_ref[:, :1], (BR, PAD))
            s_ref[:, PAD + S :] = jnp.broadcast_to(x_ref[:, S - 1 : S], (BR, width - PAD - S))
            if mode == "stage":
                o_ref[:] = s_ref[:, PAD : PAD + S]
                return
            n_lane = S // 128
            n_tiles = (BR // SUBR) * n_lane

            def tile(ti, c):
                si = ti // n_lane
                h = ti - si * n_lane
                row0 = pl.multiple_of(si * SUBR, SUBR)
                lane0 = pl.multiple_of(h * 128, 128)
                pos = (
                    0.11 * jax.lax.broadcasted_iota(jnp.float32, (SUBR, 128), 0)
                    + (lane0 + jax.lax.broadcasted_iota(jnp.int32, (SUBR, 128), 1)).astype(jnp.float32)
                )
                n0 = jnp.floor(jnp.min(pos - pos)).astype(jnp.int32)  # 0, but traced
                base = jnp.clip(PAD + lane0 + n0, 0, width - 384)
                q = base // 128
                off = base - q * 128
                win = s_ref[pl.ds(row0, SUBR), pl.ds(pl.multiple_of(q * 128, 128), 384)]
                if mode == "ladder":
                    for b in range(7):
                        bit = ((off >> b) & 1) == 1
                        win = jnp.where(bit, pltpu.roll(win, 384 - (1 << b), 1), win)
                    acc = win[:, 0:128]
                elif mode == "tiles":
                    acc = win[:, 0:128] + 0.0 * pos
                else:  # sweep12: ladder + 12 taps
                    for b in range(7):
                        bit = ((off >> b) & 1) == 1
                        win = jnp.where(bit, pltpu.roll(win, 384 - (1 << b), 1), win)
                    d0 = pos - jnp.floor(pos)
                    acc = jnp.zeros((SUBR, 128), jnp.float32)
                    for m in range(12):
                        acc = acc + jnp.maximum(0.0, 1.0 - jnp.abs(d0 - float(m))) * win[:, m : m + 128]
                o_ref[pl.ds(row0, SUBR), pl.ds(lane0, 128)] = acc
                return c

            if os.environ.get("FSG_WARP_UNROLL") == "1":
                for ti in range(n_tiles):
                    tile(ti, 0)
            else:
                jax.lax.fori_loop(0, n_tiles, tile, 0)

        mode = v[len("probe_") :]
        call = pl.pallas_call(
            ft.partial(probe_kernel, mode=mode),
            out_shape=jax.ShapeDtypeStruct((R, S), jnp.float32),
            grid=(R // BR,),
            in_specs=[pl.BlockSpec((BR, S), lambda r: (r, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BR, S), lambda r: (r, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((BR, width), jnp.float32)],
        )
        fn = jax.vmap(lambda a: call(a.reshape(R, S)).reshape(shape))
        sec, _ = timeit(lambda c: fn(c), x, iters=args.iters)
    elif v == "gather_table":  # intensity_stage's per-element table gather
        seeds = jnp.asarray(rng.integers(0, 50, size=(B, *shape)), jnp.int32)
        table = jnp.asarray(rng.normal(size=50), jnp.float32)

        def fn(c):
            mu = jnp.take(table, c.reshape(-1)).reshape(c.shape)
            return c + (mu < -10).astype(jnp.int32)

        sec, _ = timeit(fn, seeds, iters=args.iters)
    elif v == "onehot_sweep":  # label-sweep alternative to the gather
        seeds = jnp.asarray(rng.integers(0, 50, size=(B, *shape)), jnp.int32)
        table = jnp.asarray(rng.normal(size=50), jnp.float32)
        table2 = jnp.asarray(rng.normal(size=50), jnp.float32)

        def fn(c):
            mu = jnp.zeros(c.shape, jnp.float32)
            sg = jnp.zeros(c.shape, jnp.float32)
            for l in range(50):
                sel = c == l
                mu = jnp.where(sel, table[l], mu)
                sg = jnp.where(sel, table2[l], sg)
            return c + (mu + sg < -100).astype(jnp.int32)

        sec, _ = timeit(fn, seeds, iters=args.iters)
    elif v == "randn":  # one voxel-field normal draw
        key = jax.random.PRNGKey(0)

        def fn(c):
            k = jax.random.fold_in(key, jnp.int32(jnp.sum(c[0, 0, 0, :1])))
            return c + jax.random.normal(k, c.shape, jnp.float32)

        sec, _ = timeit(fn, x, iters=args.iters)
    elif v == "batched_matmul":  # per-j (D,S)@(S,OW) batched matmul (affine pass)
        M = jnp.asarray(rng.normal(size=(S, S, S)), jnp.float32)  # (j, k, s)

        def fn(c):
            return jnp.einsum(
                "jks,bjsw->bjkw",
                M,
                c.reshape(B, S, S, S).transpose(0, 2, 1, 3),
                precision=jax.lax.Precision.DEFAULT,
            ).transpose(0, 2, 1, 3)

        sec, _ = timeit(lambda c: fn(c), x, iters=args.iters)
    elif v == "matmul":  # reference point: one separable axis matmul
        M = jnp.asarray(rng.normal(size=(S, S)), jnp.float32)
        fn = lambda a: jnp.einsum("oi,bijk->bojk", M, a, precision=jax.lax.Precision.HIGHEST)
        sec, _ = timeit(lambda c: fn(c), x, iters=args.iters)
    else:
        raise SystemExit(f"unknown variant {v}")

    per_vol = sec / B
    print(
        f"{v}: {sec*1e3:.3f} ms/iter total, {per_vol*1e3:.3f} ms/vol "
        f"(B={B}, {S}^3)"
    )


if __name__ == "__main__":
    main()
