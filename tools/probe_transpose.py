"""Probe: can Mosaic transpose tiles in-kernel, and at what cost?

Decides the lanes-as-streams Huff0 redesign: 128 bitstreams per sublane
row need their DMA'd (row = stream) staging flipped to (lane = stream).
Tests (128,128) i32 jnp.transpose / jax.lax.transpose inside a Pallas
kernel, plus axis-0 take_along_axis (per-lane sublane gather), measuring
issue cost by repetition.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 64


def _bench(name, build):
    try:
        fn = build()
        x = jnp.asarray(np.random.randint(0, 1 << 20,
                                          (128, 128), np.int32))
        out = fn(x)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(50):
            out = fn(x)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 50 / REPS
        print(f"{name}: OK  {dt * 1e9:8.1f} ns per op  sum={int(out.sum())}")
        return True
    except Exception as e:
        print(f"{name}: FAIL  {type(e).__name__}: {str(e)[:140]}")
        return False


def transpose_kernel(x_ref, o_ref):
    acc = x_ref[...]
    for _ in range(REPS):
        acc = jnp.transpose(acc) + 1
    o_ref[...] = acc


def transpose8_kernel(x_ref, o_ref):
    acc = x_ref[0:8, :]
    for _ in range(REPS):
        acc = jnp.transpose(acc)[0:8, :128].astype(jnp.int32) + 1
        acc = jnp.pad(acc, ((0, 0), (0, 128 - acc.shape[1])))[:, :128]
    o_ref[...] = jnp.broadcast_to(acc[0:1, :], (128, 128))


def gather_axis0_kernel(x_ref, o_ref):
    acc = x_ref[0:8, :]
    idx = (x_ref[8:16, :] & 7)
    for _ in range(REPS):
        acc = jnp.take_along_axis(acc, idx, axis=0) + 1
    o_ref[...] = jnp.broadcast_to(acc[0:1, :], (128, 128))


def gather_axis0_32_kernel(x_ref, o_ref):
    """axis-0 gather across a 32-row window (4 stacked tiles)."""
    acc = x_ref[0:32, :]
    idx = (x_ref[32:40, :] & 31)
    r = x_ref[0:8, :]
    for _ in range(REPS):
        r = jnp.take_along_axis(acc, (idx + r) & 31, axis=0) + 1
    o_ref[...] = jnp.broadcast_to(r[0:1, :], (128, 128))


def make(kernel):
    def build():
        return jax.jit(lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        )(x))
    return build


if __name__ == "__main__":
    print("devices:", jax.devices())
    _bench("transpose_128x128", make(transpose_kernel))
    _bench("gather_axis0_8x128", make(gather_axis0_kernel))
    _bench("gather_axis0_32row", make(gather_axis0_32_kernel))
