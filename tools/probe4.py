"""Probe 4: dynamic-SUBLANE-start DMA costs (the refill/flush primitive),
and the idx-build while-loop latency."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 1000


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
        print(f"{name:58s} {best/iters*1e9:9.1f} ns/iter   ok={ok}", flush=True)
        return best / iters * 1e9
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:160]
        print(f"{name:58s} FAILED: {type(e).__name__}: {msg}", flush=True)
        return None


def mk(shape, dtype=np.int32):
    n = int(np.prod(shape))
    return (np.arange(n, dtype=np.int64) % 251).astype(dtype).reshape(shape)


# DMA: copy 1 row from (R,128) HBM at dynamic row -> (16,128) VMEM at dynamic row
def build_row_dma(space, n_dma=8, async_batch=False):
    data = mk((8192, 128))

    def kernel(d_ref, o_ref, win, sem):
        def body(i, c):
            def issue(s, c2):
                r = (i * 131 + s * 977) % 8000
                cp = pltpu.make_async_copy(
                    d_ref.at[pl.ds(r, 1)], win.at[pl.ds(s, 1)], sem.at[s])
                cp.start()
                if not async_batch:
                    cp.wait()
                return c2
            jax.lax.fori_loop(0, n_dma, issue, 0)
            if async_batch:
                def w(s, c2):
                    r = (i * 131 + s * 977) % 8000
                    pltpu.make_async_copy(
                        d_ref.at[pl.ds(r, 1)], win.at[pl.ds(s, 1)],
                        sem.at[s]).wait()
                    return c2
                jax.lax.fori_loop(0, n_dma, w, 0)
            return c + win[0, 0]
        r = jax.lax.fori_loop(0, ITERS // 10, body, 0)
        o_ref[0, :] = jnp.full((128,), r, jnp.int32)

    @jax.jit
    def fn(d):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY if space == "hbm" else pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((16, 128), jnp.int32),
                            pltpu.SemaphoreType.DMA((8,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(d)
    return fn, (jnp.asarray(data),), None


# 8-row block DMA (ring flush shape): (8,128) rows at dynamic start -> HBM out
def build_flush_dma():
    src = mk((1040, 128))

    def kernel(d_ref, o_hbm, sem):
        def body(i, c):
            r = (i * 131) % 1024
            cp = pltpu.make_async_copy(
                d_ref.at[pl.ds(r, 8)], o_hbm.at[pl.ds(r, 8)], sem)
            cp.start()
            cp.wait()
            return c
        jax.lax.fori_loop(0, ITERS // 10, body, 0)

    @jax.jit
    def fn(d):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1040, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(d)
    return fn, (jnp.asarray(src),), None


# idx-build-like while loop: vector carry, ~12 effective iters
def build_while_idx(avg_iters=12):
    tok = mk((8, 256))
    lanes_const = None

    def kernel(t_ref, o_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def round_body(i, acc):
            def cond(s):
                start, _, _, it = s
                return jnp.any(jnp.min(start, axis=1, keepdims=False) < 128) & (it < 40)

            def body(s):
                start, tptr, a, it = s
                ti = tptr & 255
                g0 = jnp.take_along_axis(t_ref[:, 0:128], ti & 127, axis=1)
                g1 = jnp.take_along_axis(t_ref[:, 128:256], ti & 127, axis=1)
                fld = jnp.where(ti < 128, g0, g1)
                ll = (fld & 7) + 2
                ml = ((fld >> 3) & 7) + 4
                e0 = start
                e1 = start + ll
                e2 = e1 + ml
                m_l = (lanes >= e0) & (lanes < e1)
                m_m = (lanes >= e1) & (lanes < e2)
                a = jnp.where(m_l, fld + lanes, jnp.where(m_m, lanes - ll, a))
                return e2, tptr + 1, a, it + 1

            start0 = jnp.zeros((8, 128), jnp.int32)
            _, _, a, _ = jax.lax.while_loop(
                cond, body, (start0, jnp.full((8, 128), i % 7, jnp.int32),
                             acc, jnp.int32(0)))
            return a
        o_ref[:] = jax.lax.fori_loop(0, ITERS, round_body,
                                     jnp.zeros((8, 128), jnp.int32))

    @jax.jit
    def fn(t):
        return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(t)
    return fn, (jnp.asarray(tok),), None


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    n = ITERS // 10 * 8
    probe("row DMA HBM->VMEM (1,128)w sync x8", lambda: build_row_dma("hbm"), iters=n)
    probe("row DMA HBM->VMEM (1,128)w async-batch8", lambda: build_row_dma("hbm", async_batch=True), iters=n)
    probe("row DMA VMEM->VMEM (1,128)w sync x8", lambda: build_row_dma("vmem"), iters=n)
    probe("flush DMA VMEM->HBM (8,128)w sync", build_flush_dma, iters=ITERS // 10)
    p = probe("idx-build while ~21 iters (8,128) carry", build_while_idx)
    if p:
        print(f"   -> per while-iter ~{p/21:.1f} ns")


if __name__ == "__main__":
    main()
