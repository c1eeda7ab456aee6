"""Probe round 2: isolate the failures + test the tile-decomposed designs."""

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


def probe(name, build, iters=ITERS):
    try:
        fn, args, check = build()
        best, out = timeit(fn, *args)
        ok = check(out) if check else True
        per = best / iters * 1e9
        print(f"{name:58s} {per:9.1f} ns/iter   ok={ok}", flush=True)
        return per
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:200]
        print(f"{name:58s} FAILED: {type(e).__name__}: {msg}", flush=True)
        return None


def mk(shape, dtype=np.int32):
    n = int(np.prod(shape))
    return (np.arange(n, dtype=np.int64) % 251).astype(dtype).reshape(shape)


# 1. sublane-axis take_along_axis on (8,128)
def build_sublane_gather():
    data = mk((8, 128))

    def kernel(d_ref, o_ref):
        def body(i, acc):
            idx = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) + i) % 8
            return acc + jnp.take_along_axis(d_ref[:], idx, axis=0)
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((8, 128), jnp.int32))

    @jax.jit
    def fn(d):
        return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(d)
    return fn, (jnp.asarray(data),), None


# 2. (128,128) as 16 unrolled (8,128) lane gathers
def build_tiled_gather():
    data = mk((128, 128))

    def kernel(d_ref, o_ref):
        def body(i, acc):
            idx = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) * 7919 + i) % 128
            outs = []
            for t in range(16):
                g = jnp.take_along_axis(d_ref[t * 8:(t + 1) * 8, :], idx, axis=1)
                outs.append(g)
            return acc + jnp.concatenate(outs, 0)
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((128, 128), jnp.int32))

    @jax.jit
    def fn(d):
        return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32))(d)
    return fn, (jnp.asarray(data),), None


# 3. wide-row gather: (8, 128*K) buffer, per-row arbitrary idx in [0,128K)
def build_wide_gather(K):
    data = mk((8, 128 * K))

    def kernel(d_ref, o_ref):
        def body(i, acc):
            idx = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) * 977 + i * 131) % (128 * K)
            sub = idx & 127
            tile = idx >> 7
            r = jnp.zeros((8, 128), jnp.int32)
            for t in range(K):
                g = jnp.take_along_axis(d_ref[:, t * 128:(t + 1) * 128], sub, axis=1)
                r = jnp.where(tile == t, g, r)
            return acc + r
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((8, 128), jnp.int32))

    @jax.jit
    def fn(d):
        return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(d)
    return fn, (jnp.asarray(data),), None


# 4. dynamic minor-dim slice read (uniform scalar start)
def build_dyn_lane_slice_read():
    data = mk((8, 4096))

    def kernel(d_ref, o_ref):
        def body(i, acc):
            s = (i * 37) % 3968
            return acc + d_ref[:, pl.ds(s, 128)]
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((8, 128), jnp.int32))

    @jax.jit
    def fn(d):
        return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(d)
    return fn, (jnp.asarray(data),), None


# 5. dynamic minor-dim slice write (uniform scalar start)
def build_dyn_lane_slice_write():
    data = mk((8, 128))

    def kernel(d_ref, o_ref, scratch):
        scratch[:, 0:128] = d_ref[:]

        def body(i, c):
            s = (i * 37) % 3968
            scratch[:, pl.ds(s, 128)] = d_ref[:] + i
            return c
        jax.lax.fori_loop(0, ITERS, body, 0)
        o_ref[:] = scratch[:, 0:128]

    @jax.jit
    def fn(d):
        return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                              scratch_shapes=[pltpu.VMEM((8, 4096), jnp.int32)])(d)
    return fn, (jnp.asarray(data),), None


# 6. i8 lane gather on (32,128) native i8 tile
def build_i8_gather():
    data = mk((32, 128), np.int8)

    def kernel(d_ref, o_ref):
        def body(i, acc):
            idx = (jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1) * 7 + i) % 128
            g = jnp.take_along_axis(d_ref[:], idx, axis=1)
            return acc + g.astype(jnp.int32)
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((32, 128), jnp.int32))

    @jax.jit
    def fn(d):
        return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32))(d)
    return fn, (jnp.asarray(data),), None


# 7. per-row DMA with 2D dynamic start (VMEM->VMEM)
def build_perrow_dma_local(n_dma=8):
    data = mk((8, 4096))

    def kernel(d_ref, o_ref, win, sem):
        def body(i, c):
            def row(s, c2):
                off = ((i * 131 + s * 977) % 3800) & ~3
                cp = pltpu.make_async_copy(
                    d_ref.at[pl.ds(s, 1), pl.ds(off, 256)],
                    win.at[pl.ds(s, 1), :],
                    sem)
                cp.start()
                cp.wait()
                return c2
            jax.lax.fori_loop(0, n_dma, row, 0)
            return c + win[0, 0]
        r = jax.lax.fori_loop(0, ITERS // 100, body, 0)
        o_ref[0, 0] = r

    @jax.jit
    def fn(d):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[pltpu.VMEM((8, 256), jnp.int32),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(d)
    return fn, (jnp.asarray(data),), None


# 8. per-row DMA HBM->VMEM with 2D dynamic start
def build_perrow_dma_hbm(n_dma=8):
    data = mk((8, 65536))

    def kernel(d_hbm, o_ref, win, sem):
        def body(i, c):
            def row(s, c2):
                off = ((i * 131 + s * 977) % 60000) & ~3
                cp = pltpu.make_async_copy(
                    d_hbm.at[pl.ds(s, 1), pl.ds(off, 256)],
                    win.at[pl.ds(s, 1), :],
                    sem)
                cp.start()
                cp.wait()
                return c2
            jax.lax.fori_loop(0, n_dma, row, 0)
            return c + win[0, 0]
        r = jax.lax.fori_loop(0, ITERS // 100, body, 0)
        o_ref[0, 0] = r

    @jax.jit
    def fn(d):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, 256), jnp.int32),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(d)
    return fn, (jnp.asarray(data),), None


# 9. dynamic sublane slice read at per-iter scalar row (baseline known-good)
def build_dyn_sublane_read():
    data = mk((4096, 128))

    def kernel(d_ref, o_ref):
        def body(i, acc):
            r = (i * 37) % 4088
            return acc + d_ref[pl.ds(r, 8), :]
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((8, 128), jnp.int32))

    @jax.jit
    def fn(d):
        return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(d)
    return fn, (jnp.asarray(data),), None


# 10. gather (8,128) from TWO tiles + select (the funnel window read)
def build_two_tile_window():
    data = mk((8, 256))

    def kernel(d_ref, o_ref):
        def body(i, acc):
            start = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 13 + i) % 128
            idx = start + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            a = jnp.take_along_axis(d_ref[:, 0:128], idx & 127, axis=1)
            b = jnp.take_along_axis(d_ref[:, 128:256], idx & 127, axis=1)
            return acc + jnp.where(idx < 128, a, b)
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((8, 128), jnp.int32))

    @jax.jit
    def fn(d):
        return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(d)
    return fn, (jnp.asarray(data),), None


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    probe("1 sublane take_along_axis (8,128) i32", build_sublane_gather)
    probe("2 (128,128) via 16 unrolled (8,128) gathers", build_tiled_gather)
    probe("3 wide gather (8,128*4) select chain", lambda: build_wide_gather(4))
    probe("3 wide gather (8,128*8) select chain", lambda: build_wide_gather(8))
    probe("3 wide gather (8,128*16) select chain", lambda: build_wide_gather(16))
    probe("4 dyn minor-dim slice READ (8,[s:s+128]) of 4096", build_dyn_lane_slice_read)
    probe("5 dyn minor-dim slice WRITE (8,[s:s+128]) of 4096", build_dyn_lane_slice_write)
    probe("6 i8 gather (32,128) tile", build_i8_gather)
    probe("9 dyn sublane slice read (4096,128)[r:r+8]", build_dyn_sublane_read)
    probe("10 two-tile funnel window (8,256)->(8,128)", build_two_tile_window)
    probe("7 per-row DMA VMEM->VMEM 8x256w dyn 2D start",
          lambda: build_perrow_dma_local(), iters=(ITERS // 100) * 8)
    probe("8 per-row DMA HBM->VMEM 8x256w dyn 2D start",
          lambda: build_perrow_dma_hbm(), iters=(ITERS // 100) * 8)


if __name__ == "__main__":
    main()
