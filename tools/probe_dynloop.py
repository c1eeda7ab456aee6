"""Probe: data-dependent front rebuilds — three shapes.

Decides the incremental-front rebuild in lane_decode: per band, only the
0..NT_P tiles that newly entered the parse window would be gathered from
backing and stored. Trip counts / guards are data-dependent (derived
from a vector via a cross-unit reduce). Checks compile + no device abort
+ per-band cost vs the static unrolled rebuild:

  static : unconditional NT_P-tile rebuild (current lane_decode shape)
  dyn    : fori_loop with runtime bounds, vector gather+store body
  when   : pl.when-guarded rebuild (vector gather+store body, no DMA)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NT_B = 8
NT_P = 4
BANDS = 256


def _gather(x_ref, t, lanes):
    widx = ((t * 128) + lanes) & (NT_B * 128 - 1)
    sub = widx & 127
    tt = widx >> 7
    g = jnp.zeros((8, 128), jnp.int32)
    for kk in range(NT_B):
        v = jnp.take_along_axis(x_ref[kk * 8:kk * 8 + 8, :], sub, axis=1)
        g = jnp.where(tt == kk, v, g)
    return g


def _delta(d_ref, b):
    # data-dependent 0..2 from a vector: cross-unit reduce to scalar
    row = jnp.max(jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == (b & 127),
        d_ref[0:8, :], 0))
    return row


def kernel_static(x_ref, d_ref, o_ref, front):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def band(b, hi):
        want = hi + _delta(d_ref, b)
        for j in range(NT_P):
            t = want - NT_P + j
            front[pl.ds((t & (NT_P - 1)) * 8, 8), :] = \
                _gather(x_ref, t, lanes)
        return want

    jax.lax.fori_loop(0, BANDS, band, jnp.int32(NT_P))
    o_ref[...] = front[...]


def kernel_dyn(x_ref, d_ref, o_ref, front):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def band(b, hi):
        want = hi + _delta(d_ref, b)

        def body(t, k):
            front[pl.ds((t & (NT_P - 1)) * 8, 8), :] = \
                _gather(x_ref, t, lanes)
            return k

        jax.lax.fori_loop(hi, want, body, 0)
        return want

    jax.lax.fori_loop(0, BANDS, band, jnp.int32(NT_P))
    o_ref[...] = front[...]


def kernel_when(x_ref, d_ref, o_ref, front):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def band(b, hi):
        d = _delta(d_ref, b)
        want = hi + d

        @pl.when(d > 0)
        def _():
            for j in range(NT_P):
                t = want - NT_P + j
                front[pl.ds((t & (NT_P - 1)) * 8, 8), :] = \
                    _gather(x_ref, t, lanes)
        return want

    jax.lax.fori_loop(0, BANDS, band, jnp.int32(NT_P))
    o_ref[...] = front[...]


def run(name, kern):
    try:
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((NT_P * 8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((NT_P * 8, 128), jnp.int32)],
        )
        f = jax.jit(f)
        x = jnp.asarray(np.random.randint(0, 1 << 20, (NT_B * 8, 128),
                                          np.int32))
        d = jnp.asarray((np.arange(8 * 128).reshape(8, 128) % 3) % 2,
                        np.int32)
        out = np.asarray(f(x, d))
        t0 = time.perf_counter()
        for _ in range(20):
            o = f(x, d)
        o.block_until_ready()
        dt = (time.perf_counter() - t0) / 20 / BANDS
        print(f"{name}: OK {dt * 1e9:9.1f} ns per band  "
              f"sum={int(out.sum())}")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    run("static 4-tile rebuild", kernel_static)
    run("dynamic-trip rebuild ", kernel_dyn)
    run("pl.when   rebuild    ", kernel_when)
