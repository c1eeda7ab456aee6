#!/usr/bin/env python
"""Benchmark: TPU batched Lizard decode throughput on one chip.

Protocol mirrors programs/bench.c:151-340 — blocks pre-split, repeated timed
loops over >= BENCH_SECONDS taking the fastest iteration, round-trip
verified. Timing covers the on-device decode pipeline (token scan + expand +
resolve) with input pre-staged in HBM and output left on device, i.e. the
per-chip kernel throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference's published single-core decode
at the same level (BASELINE.md; level 10: 2.610 GB/s).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_SECONDS = float(os.environ.get("BENCH_SECONDS", "3"))
CORPUS_MB = int(os.environ.get("BENCH_CORPUS_MB", "32"))
LEVEL = int(os.environ.get("BENCH_LEVEL", "10"))
# reference decompress MB/s per level on i5-4300U (BASELINE.md)
BASELINE_DECODE_MBPS = {10: 2610, 12: 2458, 15: 2552, 19: 2497, 21: 1795,
                        23: 1778, 26: 1734, 29: 1634, 30: 909, 32: 1244,
                        35: 1435, 39: 1502, 41: 961, 43: 1101, 46: 1073,
                        49: 1064}


def build_corpus(n_bytes: int) -> bytes:
    """Synthetic mixed-compressibility corpus (silesia.tar is not available
    in this offline environment); ratio at level 10 lands near silesia's."""
    from lizard_tpu.utils.datagen import gen, text_like
    parts = []
    seed = 0
    per = 4 << 20
    kinds = [lambda s: gen(per, s, proba=0.70),
             lambda s: text_like(per, s),
             lambda s: gen(per, s, proba=0.40),
             lambda s: gen(per, s, proba=0.55, lit_span=60)]
    while sum(map(len, parts)) < n_bytes:
        parts.append(kinds[seed % len(kinds)](seed))
        seed += 1
    return b"".join(parts)[:n_bytes]


def compress_corpus(data: bytes, level: int) -> bytes:
    """Compress via the reference library (byte-identical to our encoder —
    proven by tests — but ~1000x faster than the scalar Python oracle)."""
    try:
        from tests.oracle import _load, Oracle
        lib = _load()
        if lib is not None:
            return Oracle(lib).compress(data, level)
    except Exception:
        pass
    from lizard_tpu.ref.block_encode import compress
    return compress(data, level)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lizard_tpu.format.levels import Codewords
    from lizard_tpu.ops.pallas_decode import (
        FLAG_ROWS, LIT_ROWS, _pallas_decode_lz4)
    from lizard_tpu.ops.split import finalize, new_accumulator, split_stream

    data = build_corpus(CORPUS_MB << 20)
    comp = compress_corpus(data, LEVEL)
    ratio = len(comp) / len(data)

    acc = new_accumulator()
    family = split_stream(comp, acc, 0)
    batch = finalize(acc, family)
    if family == Codewords.LIZv1:
        raise SystemExit("bench currently targets fastLZ4 levels")

    def to_rows(a, pad_rows):
        n = len(a)
        rows = (n + 127) // 128 + pad_rows
        buf = np.zeros(rows * 128, np.int32)
        buf[:n] = a
        return buf.reshape(rows, 128)

    dev_args = [jnp.asarray(to_rows(batch.flags, FLAG_ROWS)),
                jnp.asarray(to_rows(batch.literals, LIT_ROWS)),
                jnp.asarray(batch.flags_off), jnp.asarray(batch.flags_len),
                jnp.asarray(batch.lit_off), jnp.asarray(batch.lit_len)]
    static = dict(n_blocks=int(batch.n_blocks))

    # compile + verify (fused Pallas block decoder)
    out = _pallas_decode_lz4(*dev_args, **static)
    out.block_until_ready()
    got = np.asarray(out).astype(np.uint8).reshape(-1)[:len(data)].tobytes()
    assert got == data, "round-trip verification failed"

    # fastest-of-N over >= BENCH_SECONDS (bench.c protocol)
    best = float("inf")
    t_total = 0.0
    iters = 0
    while t_total < BENCH_SECONDS:
        t0 = time.perf_counter()
        out = _pallas_decode_lz4(*dev_args, **static)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        t_total += dt
        iters += 1

    gbps = len(data) / best / 1e9
    base = BASELINE_DECODE_MBPS.get(LEVEL, 2610) / 1000.0
    print(json.dumps({
        "metric": f"decode_gbps_level{LEVEL}_1chip",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / base, 4),
    }))
    print(f"# corpus={len(data)} ratio={ratio:.4f} blocks={batch.n_blocks} "
          f"max_tokens={batch.max_tokens} iters={iters} best={best*1e3:.2f}ms "
          f"backend={jax.default_backend()}", file=sys.stderr)


if __name__ == "__main__":
    main()
