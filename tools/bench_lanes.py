"""Real-TPU bench of the lane-parallel decoder: 256 independent 128KB blocks
(the -B1 blockIndependent frame workload), verify + time."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from lizard_tpu.ops.lane_decode import (
        GROUPS, LIZ_RING_TILES, RING_TILES, SUPERS_PER_BLOCK, _lane_call,
        prepare_lane_batch, unpack_lane_output)
    from lizard_tpu.ops.split import split_streams

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    il = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    sys.path.insert(0, "tests")
    from oracle import _load, Oracle
    lib = Oracle(_load())

    from bench import build_corpus
    data = build_corpus(mb << 20)
    chunks = [data[i:i + 131072] for i in range(0, len(data), 131072)]
    t0 = time.perf_counter()
    streams = [lib.compress(c, level) for c in chunks]
    t1 = time.perf_counter()
    csize = sum(map(len, streams))
    print(f"corpus {len(data)} -> {csize} ({csize/len(data):.4f}) "
          f"in {t1-t0:.2f}s, {len(chunks)} blocks", flush=True)

    batch = split_streams(streams)
    t0 = time.perf_counter()
    lane = prepare_lane_batch(batch)
    t1 = time.perf_counter()
    print(f"prep {t1-t0:.2f}s C={lane.C} pool={lane.pool.nbytes>>20}MB",
          flush=True)

    T = lane.C * SUPERS_PER_BLOCK
    rtiles = LIZ_RING_TILES if lane.family else RING_TILES
    pool = jnp.asarray(lane.pool)
    meta = jnp.asarray(lane.meta)

    t0 = time.perf_counter()
    out = _lane_call(pool, meta, C=lane.C, T=T, spb=SUPERS_PER_BLOCK,
                     rtiles=rtiles, groups=GROUPS, il=il, family=lane.family)
    out.block_until_ready()
    t1 = time.perf_counter()
    print(f"compile+first run {t1-t0:.1f}s il={il}", flush=True)

    blocks = unpack_lane_output(np.asarray(out), lane, T)
    got = b"".join(blocks)
    if got == data:
        print("round-trip verified", flush=True)
    else:
        import os
        if os.environ.get("ABLATE") != "1":
            raise AssertionError(
                f"MISMATCH len {len(got)} vs {len(data)}: first diff "
                f"{next((k for k in range(min(len(got), len(data))) if got[k] != data[k]), '?')}")
        print("ABLATED RUN (mismatch expected)", flush=True)

    best = float("inf")
    total = 0.0
    it = 0
    while total < 3.0:
        t0 = time.perf_counter()
        out = _lane_call(pool, meta, C=lane.C, T=T, spb=SUPERS_PER_BLOCK,
                         rtiles=rtiles, groups=GROUPS, il=il,
                         family=lane.family)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        total += dt
        it += 1
    gbps = len(data) / best / 1e9
    print(f"decode: best {best*1e3:.2f} ms over {it} iters -> {gbps:.3f} GB/s "
          f"({gbps/2.61:.3f}x of reference single-core 2.61 GB/s)")


if __name__ == "__main__":
    main()
