"""Probe round 3: DMA costs, wider sublane gathers, realistic band-emit round."""

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


def probe(name, build, iters=None):
    try:
        fn, args, check = build()
        best, out = timeit(fn, *args)
        ok = check(out) if check else True
        per = best / (iters or ITERS) * 1e9
        print(f"{name:58s} {per:9.1f} ns/iter   ok={ok}", flush=True)
        return per
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:160]
        print(f"{name:58s} FAILED: {type(e).__name__}: {msg}", flush=True)
        return None


def mk(shape, dtype=np.int32):
    n = int(np.prod(shape))
    return (np.arange(n, dtype=np.int64) % 251).astype(dtype).reshape(shape)


# 1. per-row DMA with 2D dynamic start, sync wait each
def build_perrow_dma(space, n_dma=8, wait="sync"):
    data = mk((8, 65536 if space == "hbm" else 4096))

    def kernel(d_ref, o_ref, win, sem):
        def body(i, c):
            def row(s, c2):
                off = ((i * 131 + s * 977) % 3000) & ~3
                cp = pltpu.make_async_copy(
                    d_ref.at[pl.ds(s, 1), pl.ds(off, 256)],
                    win.at[pl.ds(s, 1), :], sem.at[s])
                cp.start()
                if wait == "sync":
                    cp.wait()
                return c2
            jax.lax.fori_loop(0, n_dma, row, 0)
            if wait == "async":
                def roww(s, c2):
                    off = ((i * 131 + s * 977) % 3000) & ~3
                    pltpu.make_async_copy(
                        d_ref.at[pl.ds(s, 1), pl.ds(off, 256)],
                        win.at[pl.ds(s, 1), :], sem.at[s]).wait()
                    return c2
                jax.lax.fori_loop(0, n_dma, roww, 0)
            return c + win[0, 0]
        r = jax.lax.fori_loop(0, ITERS // 100, body, 0)
        o_ref[0, :] = jnp.full((128,), r, jnp.int32)

    @jax.jit
    def fn(d):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY if space == "hbm" else pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, 256), jnp.int32),
                            pltpu.SemaphoreType.DMA((8,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(d)
    return fn, (jnp.asarray(data),), None


# 2. sublane gather on taller tiles
def build_sublane_gather(rows):
    data = mk((rows, 128))

    def kernel(d_ref, o_ref):
        def body(i, acc):
            idx = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) * 7 + i) % rows
            g = jnp.take_along_axis(d_ref[:], idx, axis=0)  # idx (8,128)? shapes differ
            return acc + g[0:8, :]
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((8, 128), jnp.int32))

    @jax.jit
    def fn(d):
        return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(d)
    return fn, (jnp.asarray(data),), None


# 2b. sublane gather (16,128) full-shape idx
def build_sublane_gather_full(rows):
    data = mk((rows, 128))

    def kernel(d_ref, o_ref):
        def body(i, acc):
            idx = (jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1) * 7 + i) % rows
            g = jnp.take_along_axis(d_ref[:], idx, axis=0)
            return acc + g
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((rows, 128), jnp.int32))

    @jax.jit
    def fn(d):
        return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32))(d)
    return fn, (jnp.asarray(data),), None


# 3. strided sublane read
def build_strided_sublane():
    data = mk((16, 128))

    def kernel(d_ref, o_ref):
        def body(i, acc):
            return acc + d_ref[:][0::2, :] + i
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((8, 128), jnp.int32))

    @jax.jit
    def fn(d):
        return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(d)
    return fn, (jnp.asarray(data),), None


# 4. realistic band-emit round (the planned kernel inner loop)
def build_band_round(ring_tiles=129, tok_iters=12):
    """Per round: tok_iters idx-build steps + ring gather chain over
    ring_tiles + lit gather over 4 tiles + pack + 1 tile write."""
    ring = mk((8, ring_tiles * 128))
    lit = mk((8, 4 * 128))
    tok = mk((8, 2 * 128))

    def kernel(ring_ref, lit_ref, tok_ref, o_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def body(i, carry):
            acc, tptr = carry
            # --- idx build: consume up to tok_iters tokens ---
            idx = jnp.zeros((8, 128), jnp.int32)
            is_lit = jnp.zeros((8, 128), jnp.bool_)
            start = jnp.zeros((8, 128), jnp.int32)
            for k in range(tok_iters):
                # read token fields from 2-tile window (funnel)
                ti = (tptr + k) & 255
                f0 = jnp.take_along_axis(tok_ref[:, 0:128], ti & 127, axis=1)
                f1 = jnp.take_along_axis(tok_ref[:, 128:256], ti & 127, axis=1)
                fld = jnp.where(ti < 128, f0, f1)
                ll = fld & 15
                ml = (fld >> 4) & 15
                off = (fld & 127) + 1
                end_l = start + ll
                end_m = end_l + ml
                m_lit = (lanes >= start) & (lanes < end_l)
                m_mat = (lanes >= end_l) & (lanes < end_m)
                idx = jnp.where(m_lit, lanes - start + fld,
                                jnp.where(m_mat, lanes - off, idx))
                is_lit = is_lit | m_lit
                start = end_m
            tptr = tptr + tok_iters
            # --- ring gather chain ---
            widx = idx & (ring_tiles * 128 - 1) if (ring_tiles & (ring_tiles - 1)) == 0 else idx % (ring_tiles * 128)
            sub = widx & 127
            tile = widx >> 7
            r = jnp.zeros((8, 128), jnp.int32)
            for t in range(ring_tiles):
                g = jnp.take_along_axis(ring_ref[:, t * 128:(t + 1) * 128], sub, axis=1)
                r = jnp.where(tile == t, g, r)
            # --- lit gather chain (4 tiles) ---
            lsub = idx & 127
            ltile = (idx >> 7) & 3
            lv = jnp.zeros((8, 128), jnp.int32)
            for t in range(4):
                g = jnp.take_along_axis(lit_ref[:, t * 128:(t + 1) * 128], lsub, axis=1)
                lv = jnp.where(ltile == t, g, lv)
            v = jnp.where(is_lit, lv, r)
            # --- funnel-shift byte assembly (2 gathers + shifts), pack ---
            sh = (idx & 3) * 8
            v2 = (v >> sh) | (v << (32 - sh))
            acc = acc * 3 + v2
            return acc, tptr
        acc, _ = jax.lax.fori_loop(0, ITERS, body,
                                   (jnp.zeros((8, 128), jnp.int32), jnp.int32(0)))
        o_ref[:] = acc

    @jax.jit
    def fn(r, l, t):
        return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(r, l, t)
    return fn, (jnp.asarray(ring), jnp.asarray(lit), jnp.asarray(tok)), None


# 5. VMEM capacity probe
def build_vmem(mb):
    words = mb * 1024 * 1024 // 4 // 128

    def kernel(o_ref, big):
        big[0, :] = jnp.ones((128,), jnp.int32)
        o_ref[:] = big[0:8, :] + big[words - 8:words, :]

    @jax.jit
    def fn():
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((words, 128), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(mb + 4) * 1024 * 1024),
        )()
    return fn, (), None


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    n = ITERS // 100 * 8
    probe("1 per-row DMA VMEM->VMEM (1,256w) sync", lambda: build_perrow_dma("vmem"), iters=n)
    probe("1 per-row DMA HBM->VMEM (1,256w) sync", lambda: build_perrow_dma("hbm"), iters=n)
    probe("1 per-row DMA HBM->VMEM (1,256w) async8", lambda: build_perrow_dma("hbm", wait="async"), iters=n)
    probe("2 sublane gather (16,128), idx(8,128)", lambda: build_sublane_gather(16))
    probe("2b sublane gather (16,128) full idx", lambda: build_sublane_gather_full(16))
    probe("2b sublane gather (32,128) full idx", lambda: build_sublane_gather_full(32))
    probe("3 strided sublane read (16,128)[0::2]", build_strided_sublane)
    p = probe("4 band round ring=129t tok=12", lambda: build_band_round(129, 12))
    if p:
        print(f"   -> est {1024/p:.2f} GB/s single-group (1KB/round)")
    p = probe("4 band round ring=32t tok=12", lambda: build_band_round(32, 12))
    if p:
        print(f"   -> est {1024/p:.2f} GB/s single-group")
    p = probe("4 band round ring=129t tok=20", lambda: build_band_round(129, 20))
    if p:
        print(f"   -> est {1024/p:.2f} GB/s single-group")
    for mb in (16, 32, 64, 100, 120):
        probe(f"5 VMEM scratch {mb} MB", lambda mb=mb: build_vmem(mb), iters=1)


if __name__ == "__main__":
    main()
