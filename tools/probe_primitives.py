"""Probe Mosaic TPU primitive support + throughput for the lane-parallel
decoder design. Each probe runs a tight fori_loop of the op inside one
pallas_call (data-dependent chain so nothing is DCE'd), timed fastest-of-N.

Run on the real chip:  python tools/probe_primitives.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 2000


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def probe(name, build):
    try:
        fn, args, check = build()
        best, out = timeit(fn, *args)
        ok = check(out) if check else True
        per = best / ITERS * 1e9
        print(f"{name:55s} {per:9.1f} ns/iter   ok={ok}")
        return per
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name:55s} FAILED: {type(e).__name__}: {msg}")
        return None


# ---------------------------------------------------------------- gathers

def build_gather(shape, dtype, idx_fn, name):
    """iterated take_along_axis along lanes (axis=-1)."""
    rows, cols = shape
    data = np.arange(rows * cols, dtype=np.int32).reshape(rows, cols) % 251
    data = data.astype(dtype)

    def kernel(d_ref, o_ref):
        idx0 = idx_fn(rows, cols)

        def body(i, acc):
            idx = (idx0 + i) % cols
            g = jnp.take_along_axis(d_ref[:], idx, axis=1)
            return acc + g.astype(jnp.int32)

        acc = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(shape, jnp.int32))
        o_ref[:] = acc

    @jax.jit
    def fn(d):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        )(d)

    def check(out):
        ref = np.zeros(shape, np.int64)
        idx0 = np.asarray(idx_fn(rows, cols))
        di = data.astype(np.int64)
        for i in range(min(ITERS, 3)):
            idx = (idx0 + i) % cols
            ref += np.take_along_axis(di, idx, axis=1)
        # just check first few iters contribute right pattern: full check
        ref = np.zeros(shape, np.int64)
        for i in range(ITERS):
            idx = (idx0 + i) % cols
            ref += np.take_along_axis(di, idx, axis=1)
        return bool((np.asarray(out) == (ref & 0xFFFFFFFF).astype(np.int64) % (1 << 32)).all() or
                    np.array_equal(np.asarray(out).astype(np.uint32), ref.astype(np.uint32)))

    return fn, (jnp.asarray(data),), check


def rand_idx(rows, cols):
    return jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) * 7919 % cols


def scalar_row_idx(rows, cols):
    # per-row single index broadcast across lanes (token-read pattern)
    return (jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) * 131) % cols


# ------------------------------------------------------------- transpose

def build_transpose():
    data = np.arange(128, dtype=np.int32).reshape(1, 128)

    def kernel(d_ref, o_ref):
        def body(i, acc):
            t = d_ref[:] + i
            tt = t.reshape(128, 1)  # may or may not lower
            return acc + tt

        acc = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((128, 1), jnp.int32))
        o_ref[:] = acc

    @jax.jit
    def fn(d):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((128, 1), jnp.int32))(d)

    def check(out):
        ref = (np.arange(128)[:, None] * ITERS +
               (ITERS - 1) * ITERS // 2)
        return bool(np.array_equal(np.asarray(out), ref))

    return fn, (jnp.asarray(data),), check


def build_transpose2d():
    data = np.arange(128 * 128, dtype=np.int32).reshape(128, 128)

    def kernel(d_ref, o_ref):
        def body(i, acc):
            return acc + (d_ref[:] + i).T

        acc = jax.lax.fori_loop(0, ITERS, body,
                                jnp.zeros((128, 128), jnp.int32))
        o_ref[:] = acc

    @jax.jit
    def fn(d):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32))(d)

    def check(out):
        ref = data.T.astype(np.int64) * ITERS + (ITERS - 1) * ITERS // 2
        return bool(np.array_equal(np.asarray(out), ref))

    return fn, (jnp.asarray(data),), check


# --------------------------------------------------- masked RMW on slice

def build_rmw(cols_total, active):
    data = np.zeros((128, cols_total), np.int32)

    def kernel(d_ref, o_ref, scratch):
        scratch[:] = jnp.zeros_like(scratch)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (128, active), 1)

        def body(i, carry):
            start = (i * 37) % (cols_total - active)
            cur = scratch[:, pl.ds(start, active)]
            mask = (lanes >= (i % 13)) & (lanes < (i % 13) + 64)
            scratch[:, pl.ds(start, active)] = jnp.where(mask, cur + i, cur)
            return carry

        jax.lax.fori_loop(0, ITERS, body, 0)
        o_ref[:] = scratch[:, 0:128]

    @jax.jit
    def fn(d):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((128, cols_total), jnp.int32)])(d)

    return fn, (jnp.asarray(data),), None


# ---------------------------------------------------- vector op baseline

def build_vecbaseline(shape):
    data = np.ones(shape, np.int32)

    def kernel(d_ref, o_ref):
        def body(i, acc):
            return acc * 3 + d_ref[:] + i

        acc = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(shape, jnp.int32))
        o_ref[:] = acc

    @jax.jit
    def fn(d):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.int32))(d)

    return fn, (jnp.asarray(data),), None


# --------------------------------------------------------- per-lane DMA

def build_perlane_dma(n_lanes=128, chunk=2048):
    # HBM (128, 32768) i8-as-i32-packed rows; DMA row slices at per-row
    # dynamic offsets into VMEM (128, chunk)
    src = np.arange(128 * 32768, dtype=np.int32).reshape(128, 32768) % 251

    def kernel(off_ref, src_hbm, o_ref, scratch, sem):
        def body(l, carry):
            off = off_ref[l]
            cp = pltpu.make_async_copy(
                src_hbm.at[pl.ds(l, 1), pl.ds(off, chunk)],
                scratch.at[pl.ds(l, 1), :],
                sem)
            cp.start()
            cp.wait()
            return carry

        jax.lax.fori_loop(0, n_lanes, body, 0)
        o_ref[:] = scratch[:, 0:128]

    @jax.jit
    def fn(off, s):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((128, chunk), jnp.int32),
                                pltpu.SemaphoreType.DMA(())],
            ),
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(off, s)

    off = (np.arange(128, dtype=np.int32) * 13) % (32768 - chunk)
    off = (off // 128) * 128

    def check(out):
        got = np.asarray(out)
        want = np.stack([src[l, off[l]:off[l] + 128] for l in range(128)])
        return bool(np.array_equal(got, want))

    global ITERS_SAVE
    return fn, (jnp.asarray(off), jnp.asarray(src)), check


def main():
    print(f"backend={jax.default_backend()} dev={jax.devices()}")
    base = probe("vec baseline (8,128) i32 mul-add", lambda: build_vecbaseline((8, 128)))
    probe("vec baseline (128,128) i32 mul-add", lambda: build_vecbaseline((128, 128)))
    probe("vec baseline (128,512) i32 mul-add", lambda: build_vecbaseline((128, 512)))
    probe("gather lanes (8,128) i32 rand idx", lambda: build_gather((8, 128), np.int32, rand_idx, ""))
    probe("gather lanes (128,128) i32 rand idx", lambda: build_gather((128, 128), np.int32, rand_idx, ""))
    probe("gather lanes (128,512) i32 rand idx", lambda: build_gather((128, 512), np.int32, rand_idx, ""))
    probe("gather lanes (128,1024) i32 rand idx", lambda: build_gather((128, 1024), np.int32, rand_idx, ""))
    probe("gather lanes (128,128) i8 rand idx", lambda: build_gather((128, 128), np.int8, rand_idx, ""))
    probe("gather lanes (128,512) i8 rand idx", lambda: build_gather((128, 512), np.int8, rand_idx, ""))
    probe("gather lanes (8,128) u8 rand idx", lambda: build_gather((8, 128), np.uint8, rand_idx, ""))
    probe("transpose (1,128)->(128,1) i32 reshape", build_transpose)
    probe("transpose (128,128) i32 .T", build_transpose2d)
    probe("masked RMW dyn slice (128,512) of 4096", lambda: build_rmw(4096, 512))
    probe("masked RMW dyn slice (128,256) of 4096", lambda: build_rmw(4096, 256))

    global ITERS
    ITERS = 1  # DMA probe: one grid pass with 128 DMAs
    per = probe("128 per-lane DMAs (1,2048) i32 HBM->VMEM", build_perlane_dma)
    if per is not None:
        print(f"  -> per-DMA cost ~{per/128:.0f} ns, refill BW "
              f"~{128*2048*4/ (per*1e-9) / 1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
