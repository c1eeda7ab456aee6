"""Stage decomposition of the TPU encoder (dependent-chain timing).

Times cumulative prefixes of ops/encode_tpu._encode_batch so stage cost
= difference of adjacent rows. Every iteration's input depends on the
previous output (the axon runtime caches identical pure-XLA executions;
see bench.py bench_encode_tpu).

Usage: python tools/abench_encode.py [seconds-per-stage]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import lizard_tpu  # noqa: F401  (enables the persistent compile cache)
from lizard_tpu.ops import encode_tpu as E
from bench import build_corpus

B = 8
N = E.N
SECONDS = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0


def stage_fn(stage):
    @jax.jit
    def fn(u8, n, salt):
        u8 = u8 + salt.astype(jnp.uint8)
        pos = jnp.arange(N, dtype=jnp.int32)[None, :]
        nn = n[:, None].astype(jnp.int32)
        u = u8.astype(jnp.uint32)
        w = (u | jnp.roll(u, -1, axis=1) << 8
             | jnp.roll(u, -2, axis=1) << 16
             | jnp.roll(u, -3, axis=1) << 24)
        h = ((w * jnp.uint32(2654435761)) >> jnp.uint32(32 - E.HASHLOG)
             ).astype(jnp.int32)
        if stage == 1:
            return jnp.sum(h)
        sidx = jnp.argsort(h, axis=1, stable=True)
        if stage == 2:
            return jnp.sum(sidx)
        inv = jnp.argsort(sidx, axis=1)
        hs = jnp.take_along_axis(h, sidx, axis=1)
        prev = jnp.roll(sidx, 1, axis=1)
        same = (hs == jnp.roll(hs, 1, axis=1)) & (
            jnp.arange(N)[None, :] > 0)
        cand = jnp.take_along_axis(jnp.where(same, prev, -1), inv, axis=1)
        if stage == 3:
            return jnp.sum(cand)
        safe_c = jnp.clip(cand, 0, N - 1)
        off = pos - safe_c
        valid = ((cand >= 0) & (off >= 8) & (off <= 65535)
                 & (jnp.take_along_axis(w, safe_c, axis=1) == w)
                 & (pos < nn - 20) & (nn >= 21))

        def ext_round(r, st):
            ml, live, extra = st
            a = jnp.take_along_axis(w, jnp.minimum(pos + 4 * r, N - 1),
                                    axis=1)
            b = jnp.take_along_axis(w, jnp.minimum(safe_c + 4 * r, N - 1),
                                    axis=1)
            x = a ^ b
            eq = (x == 0) & (live != 0)
            tz = jnp.where((x & 0xFF) == 0,
                           jnp.where((x & 0xFFFF) == 0,
                                     jnp.where((x & 0xFFFFFF) == 0, 3, 2),
                                     1), 0)
            extra = jnp.where((live != 0) & ~eq, tz, extra)
            ml = ml + jnp.where(eq, 4, 0)
            return ml, eq.astype(jnp.int32), extra

        ml, live_i, extra = jax.lax.fori_loop(
            1, E.EXT_ROUNDS, ext_round,
            (jnp.full((B, N), 4, jnp.int32), valid.astype(jnp.int32),
             jnp.zeros((B, N), jnp.int32)))
        ml = ml + jnp.where(live_i != 0, 0, extra) * valid
        ml = jnp.minimum(ml, E.CHUNK - (pos % E.CHUNK))
        ml = jnp.minimum(ml, nn - 16 - pos)
        if stage == 4:
            return jnp.sum(ml)
        has_m = valid & (ml >= 4)
        mlc = jnp.where(has_m, ml, 0).reshape(B, E.NCH, E.CHUNK)
        p0 = jnp.zeros((B, E.NCH), jnp.int32)
        bits = jnp.zeros((B, E.NCH, E.CHUNK // 32), jnp.int32)

        def step(_, st):
            p, bits = st
            pc = jnp.minimum(p, E.CHUNK - 1)[..., None]
            m = jnp.take_along_axis(mlc, pc, axis=2)[..., 0]
            act = p < E.CHUNK
            hit = act & (m >= 4)
            wsel = p >> 5
            bset = jnp.where(hit[..., None] & (
                wsel[..., None]
                == jnp.arange(E.CHUNK // 32)[None, None, :]),
                jnp.left_shift(jnp.int32(1), (p & 31)[..., None]), 0)
            return p + jnp.where(hit, m, jnp.where(act, 1, 0)), bits | bset

        _, bits = jax.lax.fori_loop(0, E.CHUNK, step, (p0, bits))
        if stage == 5:
            return jnp.sum(bits)
        f, nt, l, ll, _ = E._encode_batch(u8, n)
        return (jnp.sum(f.astype(jnp.int32)) + jnp.sum(l.astype(jnp.int32))
                + jnp.sum(ll))
    return fn


def main():
    data = build_corpus(B * N)
    u8 = np.frombuffer(data, np.uint8).reshape(B, N).copy()
    n = np.full((B,), N, np.int32)
    ju, jn = jnp.asarray(u8), jnp.asarray(n)
    prev = 0.0
    names = {1: "words+hash", 2: "+argsort", 3: "+inv+cand",
             4: "+extension", 5: "+walk", 6: "full"}
    for stage in (1, 2, 3, 4, 5, 6):
        fn = stage_fn(stage)
        salt = (fn(ju, jn, jnp.uint8(0)) % 2).astype(jnp.uint8)
        salt.block_until_ready()
        best, tt, it = float("inf"), 0.0, 0
        while tt < SECONDS and it < 110:
            t0 = time.perf_counter()
            salt = (fn(ju, jn, salt + jnp.uint8(2 * it + 2)) % 2
                    ).astype(jnp.uint8)
            salt.block_until_ready()
            dt = time.perf_counter() - t0
            best = min(best, dt)
            tt += dt
            it += 1
        print(f"stage {stage} {names[stage]:11s}: {best*1e3:7.2f} ms "
              f"(delta {max(best - prev, 0)*1e3:6.2f} ms)  "
              f"{B*N/best/1e9:.3f} GB/s")
        prev = best


if __name__ == "__main__":
    main()
