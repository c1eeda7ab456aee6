"""Probe: XLA-on-TPU throughput of the encoder pipeline's bulk stages.

The TPU-native match finder plan is: hash4 every position, stable-argsort
by hash (ties keep position order), take the sorted predecessor as the
nearest-previous-occurrence candidate, invert the permutation with a
second argsort (no scatter), then verify/extend matches with word
gathers. All dense XLA ops — this probe measures whether sort + gather
sustain encoder-grade throughput (target >= 0.25 GB/s of input).

Shapes: B blocks x 128 KB = N positions each.

CAVEAT (discovered after the fact): the axon runtime CACHES identical
pure-XLA executions, so this probe's repeated-identical-call timings are
upper bounds on dispatch, not execution (argsort printed "0.06 ms" for
1M keys). Real steady-state encoder throughput, measured with a
dependent chain (see bench.py bench_encode_tpu): ~0.30 GB/s end to end.
The probe is kept for the op-compatibility checks, not the numbers.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B = 8
N = 131072


def bench(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    dt = (time.perf_counter() - t0) / 5
    mb = B * N / 1e6
    print(f"{name}: {dt * 1e3:8.2f} ms  ({mb / dt / 1000:.3f} GB/s input)")
    return out


def main():
    rng = np.random.default_rng(0)
    # mixed-entropy input: repeated structure so hashes collide realistically
    base = rng.integers(0, 256, N // 4, np.uint8)
    data = np.concatenate([base, base, base, base])
    x = jnp.asarray(np.broadcast_to(data, (B, N)).copy())

    @jax.jit
    def words(u8):
        u = u8.astype(jnp.uint32)
        w = (u[:, :-3] | (u[:, 1:-2] << 8) | (u[:, 2:-1] << 16)
             | (u[:, 3:] << 24))
        return jnp.pad(w, ((0, 0), (0, 3)))

    w = bench("words  ", words, x)

    @jax.jit
    def hash4(w):
        return ((w * jnp.uint32(2654435761)) >> jnp.uint32(16)
                ).astype(jnp.int32)

    h = bench("hash4  ", hash4, w)

    @jax.jit
    def sort_stable(h):
        return jnp.argsort(h, axis=1, stable=True)

    sidx = bench("argsort", sort_stable, h)

    @jax.jit
    def invert(sidx):
        return jnp.argsort(sidx, axis=1, stable=True)

    inv = bench("inv-argsort", invert, sidx)

    @jax.jit
    def candidates(h, sidx, inv):
        hs = jnp.take_along_axis(h, sidx, axis=1)
        prev = jnp.roll(sidx, 1, axis=1)
        same = hs == jnp.roll(hs, 1, axis=1)
        cand_sorted = jnp.where(same, prev, -1)
        return jnp.take_along_axis(cand_sorted, inv, axis=1)

    cand = bench("cand   ", candidates, h, sidx, inv)

    @jax.jit
    def extend(w, cand):
        safe = jnp.maximum(cand, 0)
        total = jnp.zeros(w.shape, jnp.int32)
        live = cand >= 0
        for r in range(8):
            a = jnp.take_along_axis(
                w, jnp.minimum(jnp.arange(N)[None, :] + 4 * r, N - 1),
                axis=1)
            b = jnp.take_along_axis(
                w, jnp.minimum(safe + 4 * r, N - 1), axis=1)
            eq = (a == b) & live
            total = total + jnp.where(eq, 4, 0)
            live = eq
        return total

    ml = bench("extend8", extend, w, cand)

    nm = int(jnp.sum((ml >= 4) & (cand >= 0)))
    print(f"match positions: {nm}/{B * N} ({100 * nm / (B * N):.1f}%)")


if __name__ == "__main__":
    main()
