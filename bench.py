#!/usr/bin/env python
"""Benchmark: TPU lane-parallel Lizard decode throughput on one chip.

Protocol mirrors programs/bench.c:151-340 — repeated timed loops over
>= BENCH_SECONDS taking the fastest iteration, round-trip verified.

Workload: the corpus is cut into 128 KB independent blocks (exactly the
frame format's blockIndependent -B1 mode, the codec's data-parallel unit,
doc/lizard_Frame_format.md:151-159) and decoded by the banded lane-parallel
Pallas kernel (lizard_tpu/ops/lane_decode.py): 128 block-slots decode
simultaneously, 8 per sublane row x 16 groups, 4 groups interleaved per
kernel instance. Timing covers the on-device decode with inputs pre-staged
in HBM and output left on device (the reference's RAM-to-RAM analogue).
For Huffman levels (30-49) BOTH on-device stages are timed: the
cell-chained Huff0 kernel (ops/huf128.py, AOT-compiled and timed on its
first execution — repeat executions are served from a runtime cache —
with output verified against the host entropy decoder) plus the LZ lane
kernel; host staging between the stages is excluded.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "sweep",
"encode_mbps"}. metric/value/vs_baseline are the headline level
(BENCH_LEVEL, default 10) against the reference's published single-core
decode (BASELINE.md; level 10: 2.610 GB/s). "sweep" records one decode
GB/s entry per level across all four families on the same corpus
(BENCH_SWEEP=0 to disable); "encode_mbps" records the native C++
encoder's speed per family.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_SECONDS = float(os.environ.get("BENCH_SECONDS", "3"))
CORPUS_MB = int(os.environ.get("BENCH_CORPUS_MB", "32"))
LEVEL = int(os.environ.get("BENCH_LEVEL", "10"))
IL = int(os.environ.get("BENCH_IL", "4"))
SWEEP = os.environ.get("BENCH_SWEEP", "1") != "0"
SWEEP_LEVELS = (10, 12, 19, 21, 29, 35, 41, 49)
ENCODE_LEVELS = (11, 21, 35, 41)
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


def build_corpus_realfiles(n_bytes: int) -> bytes | None:
    """Real mixed corpus: deterministic concatenation (sorted walk, tar
    spirit) of the reference tree's files -- ~16 MB of real C sources,
    docs, and build files. Complements the synthetic corpus so ratio
    numbers do not depend on datagen's statistics (the reference's tables
    are fixed-corpus, README.md:32-79). None when the tree is absent."""
    import sysconfig
    roots = os.environ.get(
        "BENCH_REALFILES_DIR",
        # reference tree (~1.4 MB of C/docs) + Python stdlib sources
        # (tens of MB of real code/text, stable within the image)
        "/root/reference:" + sysconfig.get_paths()["stdlib"]).split(":")
    parts, total = [], 0
    for root in roots:
        if not os.path.isdir(root):
            continue
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            if "__pycache__" in dirnames:
                dirnames.remove("__pycache__")   # .pyc embed timestamps
            for fn in sorted(filenames):
                p = os.path.join(dirpath, fn)
                try:
                    with open(p, "rb") as f:
                        b = f.read()
                except OSError:
                    continue
                parts.append(b)
                total += len(b)
                if total >= n_bytes:
                    return b"".join(parts)[:n_bytes]
    data = b"".join(parts)
    return data if data else None


def compress_blocks(data: bytes, level: int) -> list[bytes]:
    """Compress 128 KB independent blocks via the reference library
    (byte-identical to our encoder — proven by tests — but ~1000x faster
    than the scalar Python oracle)."""
    chunks = [data[i:i + 131072] for i in range(0, len(data), 131072)]
    try:
        from tests.oracle import _load, Oracle
        lib = _load()
        if lib is not None:
            o = Oracle(lib)
            return [o.compress(c, level) for c in chunks]
    except Exception:
        pass
    from lizard_tpu.ref.block_encode import compress
    return [compress(c, level) for c in chunks]


def bench_decode_level(data, level, seconds, extra=None):
    """Fastest-of-N on-device decode of `data` at `level`; returns
    (GB/s, ratio, iters, best_ms). For Huffman levels (30-49) the timed
    region covers the FUSED device pipeline (ops/fuse.py): the
    cell-chained Huff0 kernel + rank translation + the compact pass that
    rebuilds the streams inside the lane pool (one-shot AOT-timed), plus
    the pipelined LZ lane kernel reading that pool. Decoded entropy
    bytes never return to the host; the remaining host work (header
    parse + pool layout + huf schedule) is reported via `extra` as
    host_stage_ms (the reference's timed region includes its own
    stream-header parsing, programs/bench.c:151-340)."""
    import numpy as np
    import jax.numpy as jnp

    from lizard_tpu.ops.lane_decode import (
        GROUPS, LIZ_RING_TILES, RING_TILES, SUPERS_PER_BLOCK, _lane_call,
        unpack_lane_output)

    streams = compress_blocks(data, level)
    ratio = sum(map(len, streams)) / len(data)

    # FUSED plan: headers parsed host-side only; Huffman bytes never
    # return to the host (ops/fuse.py: huf128 -> translate -> compact
    # into the lane pool, all on device)
    from lizard_tpu.ops.fuse import _compact_call, build_fused_plan

    t_host0 = time.perf_counter()
    lane, batch, hb, tm, pool_np = build_fused_plan(streams)
    t_host_stage = time.perf_counter() - t_host0
    if extra is not None:
        # the only remaining host work around the timed device region
        # (header parse + pool layout + huf schedule)
        extra["host_stage_ms"] = round(t_host_stage * 1e3, 1)

    t_huf_best = 0.0
    if hb is not None:
        # One-shot AOT-timed entropy+compact stage: the axon runtime
        # serves REPEAT executions of an executable from a cache (first
        # call real, later calls ~0.1 ms), so the only honest protocol
        # is to AOT-compile and time exactly the FIRST execution; the
        # full-pipeline round-trip check below verifies the output.
        from lizard_tpu.ops.huf128 import _huf128_call, _translate_call
        import jax
        g = hb.groups
        hm, hv, hp, hl, ht = map(jnp.asarray,
                                 (hb.meta_s, hb.vmeta, hb.pool,
                                  hb.luts, hb.tmeta))
        tmj = jnp.asarray(tm)
        c1 = _huf128_call.lower(hm, hv, hp, T=hb.T, groups=g, il=g,
                                out_rows=hb.out_rows).compile()
        c2 = _translate_call.lower(
            ht, jnp.zeros((hb.out_rows, 128), jnp.int32), hl).compile()
        c3 = _compact_call.lower(
            tmj, jax.ShapeDtypeStruct((hb.out_rows, 128), jnp.int32),
            jnp.asarray(pool_np), R=pool_np.shape[0]).compile()
        for a in (hm, hv, hp, hl, ht, tmj):   # pre-stage inputs in HBM
            a.block_until_ready()
        # warm the executables with a same-shape DECOY (all cells dead:
        # meta/vmeta -1) so the timed first real execution excludes
        # one-time executable load; the decoy's content differs, so a
        # content-keyed execution cache cannot serve the real run
        fence = jax.jit(lambda x: jnp.sum(x))
        zm = jnp.full_like(hm, -1)
        zv = jnp.full_like(hv, -1)
        decoy_pool = jnp.asarray(pool_np)      # donated by c3
        float(fence(c3(tmj, c2(ht, c1(zm, zv, hp), hl), decoy_pool)))
        # calibrate the fixed scalar-sync round trip (the tunnel costs
        # ~60 ms per blocking sync) and charge the kernels only their
        # execution time beyond it
        tiny = jnp.ones((8, 128), jnp.int32)
        float(fence(tiny))
        rtts = []
        for _ in range(3):
            tr = time.perf_counter()
            float(fence(tiny))
            rtts.append(time.perf_counter() - tr)
        rtt = sorted(rtts)[1]
        # the timed run's fence is a DISTINCT never-executed executable
        # (pre-compiled outside the timed region): even an
        # executable-keyed execution cache cannot return it without
        # draining the device queue
        timed_fence = jax.jit(
            lambda x: jnp.sum(x) + jnp.int32(level)).lower(
                jax.ShapeDtypeStruct(pool_np.shape, jnp.int32)).compile()
        t0 = time.perf_counter()
        r = c1(hm, hv, hp)
        o = c2(ht, r, hl)
        pool = c3(tmj, o, jnp.asarray(pool_np))
        float(timed_fence(pool))
        t_huf_best = max(time.perf_counter() - t0 - rtt, 0.0)
    else:
        pool = jnp.asarray(pool_np)
    T = lane.C * SUPERS_PER_BLOCK
    rtiles = LIZ_RING_TILES if lane.family else RING_TILES
    meta = jnp.asarray(lane.meta)

    def run():
        return _lane_call(pool, meta, C=lane.C, T=T, spb=SUPERS_PER_BLOCK,
                          rtiles=rtiles, groups=GROUPS, il=IL,
                          family=lane.family)

    # compile + verify
    out = run()
    out.block_until_ready()
    blocks = unpack_lane_output(np.asarray(out), lane, T)
    assert b"".join(blocks) == data, "round-trip verification failed"

    # PIPELINED timing (bench.c's repeated-loop protocol, adapted to a
    # remote device): a blocking sync through the axon tunnel costs a
    # fixed ~60 ms scalar round trip, so blocking every iteration floors
    # every measurement at the RTT regardless of kernel speed. Instead
    # dispatch PIPE executions back-to-back and sync once via a scalar
    # reduction fence (the device executes in dispatch order, so the
    # fence's completion implies all iterations completed); the batch
    # average amortizes the RTT to RTT/PIPE. Verified real (not
    # cache-served) by linearity: total time grows ~linearly in PIPE
    # for this kernel (N=4/8/16 measured 46/42/41 ms per iteration).
    import jax
    fence = jax.jit(lambda x: jnp.sum(x))
    PIPE = 8
    best = float("inf")
    t_total = 0.0
    iters = 0
    while t_total < seconds:
        t0 = time.perf_counter()
        for _ in range(PIPE):
            o = run()
        float(fence(o))
        dt = time.perf_counter() - t0
        best = min(best, dt / PIPE)
        t_total += dt
        iters += PIPE
    best += t_huf_best  # entropy stage (0 for non-Huffman levels)
    return len(data) / best / 1e9, ratio, iters, best * 1e3


def bench_sharded_dp1(data, seconds):
    """The PRODUCTION lane kernel under shard_map on a 1-device mesh at
    level 10 — proves the sharded step (pipeline.decode_streams_
    sharded_lanes, the path dryrun_multichip validates at 8 devices)
    adds no overhead over the direct _lane_call the headline row times.
    Returns {gbps, vs_direct_pct est via the headline row}."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from lizard_tpu.ops.lane_decode import (
        GROUPS, RING_TILES, SUPERS_PER_BLOCK, _lane_call,
        prepare_lane_batch, unpack_lane_output)
    from lizard_tpu.ops.split import split_streams
    from lizard_tpu.parallel.pipeline import decode_streams_sharded_lanes
    import functools
    from jax.sharding import PartitionSpec as P

    streams = compress_blocks(data, LEVEL)
    mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))
    # one verification pass through the public sharded entry
    got = decode_streams_sharded_lanes(streams, mesh, il=IL)
    assert b"".join(got) == data, "sharded decode round-trip failed"

    # timed: the same sharded step over the pre-staged batch
    batch = split_streams(streams, entropy="host")
    lane = prepare_lane_batch(batch)
    T = lane.C * SUPERS_PER_BLOCK

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("dp"), P("dp")), out_specs=P("dp"),
                       check_vma=False)
    def step(pool_s, meta_s):
        return _lane_call(pool_s[0], meta_s[0], C=lane.C, T=T,
                          spb=SUPERS_PER_BLOCK, rtiles=RING_TILES,
                          groups=GROUPS, il=IL, family=lane.family)[None]

    step_j = jax.jit(step)
    pool = jnp.asarray(lane.pool[None])
    meta = jnp.asarray(lane.meta[None])
    out = step_j(pool, meta)
    out.block_until_ready()
    blocks = unpack_lane_output(np.asarray(out)[0], lane, T)
    assert b"".join(blocks) == data

    fence = jax.jit(lambda x: jnp.sum(x))
    PIPE = 8
    best = float("inf")
    t_total = 0.0
    while t_total < seconds:
        t0 = time.perf_counter()
        for _ in range(PIPE):
            o = step_j(pool, meta)
        float(fence(o))
        dt = time.perf_counter() - t0
        best = min(best, dt / PIPE)
        t_total += dt
    return {"gbps": round(len(data) / best / 1e9, 4)}


def bench_encode(data):
    """Native C++ encoder MB/s + ratio per family level."""
    from lizard_tpu import runtime
    if not runtime.available():
        return {}
    out = {}
    for level in ENCODE_LEVELS:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            comp = runtime.compress(data, level)
            best = min(best, time.perf_counter() - t0)
        out[str(level)] = {"mbps": round(len(data) / best / 1e6, 1),
                           "ratio": round(len(comp) / len(data), 4)}
    return out


def bench_decode_native(data):
    """Native C++ host decoder GB/s per family level (decoding the
    bit-exact oracle-equivalent streams produced by the native
    encoder). The host-runtime counterpart of the reference's headline
    lzbench numbers (BASELINE.md)."""
    from lizard_tpu import runtime
    if not runtime.available():
        return {}
    out = {}
    for level in ENCODE_LEVELS:
        comp = runtime.compress(data, level)
        dec = runtime.decompress(comp, len(data))
        if dec != data:
            out[str(level)] = {"error": "round-trip mismatch"}
            continue
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            runtime.decompress(comp, len(data))
            best = min(best, time.perf_counter() - t0)
        out[str(level)] = {"gbps": round(len(data) / best / 1e9, 3)}
    return out


def bench_encode_tpu(data, seconds):
    """TPU-native fastLZ4 encoder (ops/encode_tpu.py): on-device GB/s +
    ratio. Timed with a DEPENDENT chain — the axon runtime caches
    identical pure-XLA executions, so back-to-back identical calls
    measure the cache, not the chip. Expected ~0.001 GB/s: XLA-level
    gathers at this scale are off the fast path (module docstring)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lizard_tpu.ops.encode_tpu import _encode_batch, N, encode_blocks_tpu

    nb = min(len(data) // N, 8)    # B=8: compile stays seconds-scale
    u8 = np.frombuffer(data[:nb * N], np.uint8).reshape(nb, N).copy()
    n = np.full((nb,), N, np.int32)

    @jax.jit
    def step(u, n, salt):
        f, nt, l, ll, _ = _encode_batch(
            (u + salt.astype(jnp.uint8)), n)
        s = (jnp.sum(f.astype(jnp.int32)) + jnp.sum(l.astype(jnp.int32))
             + jnp.sum(ll))
        return (s % 2).astype(jnp.uint8)   # 0/1 salt: tiny input delta

    ju, jn = jnp.asarray(u8), jnp.asarray(n)
    salt = step(ju, jn, jnp.uint8(0))
    salt.block_until_ready()
    best = float("inf")
    tt = 0.0
    it = 0
    while tt < seconds and it < 120:
        t0 = time.perf_counter()
        # salt depends on the previous output AND the iteration index, so
        # no two iterations ever present the same input
        salt = step(ju, jn, salt + jnp.uint8(2 * it + 2))
        salt.block_until_ready()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        tt += dt
        it += 1
    comp = encode_blocks_tpu([data[i:i + N] for i in range(0, len(data), N)])
    ratio = sum(map(len, comp)) / len(data)
    return nb * N / best / 1e9, ratio


def bench_encode_lanes(data, seconds):
    """Pallas lane encoder (ops/enc_lanes.py): on-device GB/s of the
    p1+passA kernels over distinct 1 MB groups (Pallas kernels are
    side-effecting and never served from the axon execution cache), plus
    the end-to-end ratio through host emission."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import (cfg_for_level, p1_call,
                                          p15_call, pA_call, pack_blocks,
                                          encode_blocks_lanes)

    enc_level = int(os.environ.get("BENCH_ENC_LEVEL", "11"))
    cfg = cfg_for_level(enc_level)
    pa_cfg = dataclasses.replace(cfg, chain=0) if cfg.chain else cfg
    il = int(os.environ.get("BENCH_ENC_IL", "1"))
    N = cfg.n
    blocks = [data[i:i + N] for i in range(0, len(data), N)]
    groups = []
    for base in range(0, len(blocks) - 8 * il + 1, 8 * il):
        subs = [blocks[base + k * 8:base + (k + 1) * 8]
                for k in range(il)]
        packs = [pack_blocks(sg, cfg) for sg in subs]
        w32i = np.concatenate([w for w, _ in packs], axis=0)
        meta = np.concatenate([m for _, m in packs])
        groups.append((jnp.asarray(w32i), jnp.asarray(meta),
                       [jnp.asarray(w) for w, _ in packs],
                       [jnp.asarray(m) for _, m in packs]))
    for w, m, _, _ in groups:
        w.block_until_ready()

    def run_group(grp):
        w, m, ws, ms = grp
        p1s = [p1_call(wk, mk, cfg) for wk, mk in zip(ws, ms)]
        if cfg.chain:       # phase 1.5: chain walk into map 0
            p1s = [p15_call(wk, pk, mk, cfg)
                   for wk, mk, pk in zip(ws, ms, p1s)]
        cands = jnp.concatenate(p1s, axis=0) if il > 1 else p1s[0]
        return pA_call(w, cands, m, pa_cfg, il=il)

    run_group(groups[0]).block_until_ready()    # warm compile

    done = 0
    t0 = time.perf_counter()
    g = 0
    while True:
        tok = run_group(groups[g % len(groups)])
        g += 1
        done += 8 * il * N
        if g % 4 == 0:
            tok.block_until_ready()
            if time.perf_counter() - t0 >= seconds and g >= len(groups):
                break
    tok.block_until_ready()
    dt = time.perf_counter() - t0

    comp = encode_blocks_lanes(blocks[:32], level=enc_level)
    ratio = sum(map(len, comp)) / sum(len(b) for b in blocks[:32])
    # round-trip spot check
    from lizard_tpu.ref.block_decode import decompress
    assert bytes(decompress(comp[0], max_out=len(blocks[0]))) == blocks[0]
    return done / dt / 1e9, ratio


def bench_huf_encode(data, seconds):
    """TPU Huff0 bit-packing kernel (ops/enc_huf.py): GB/s of symbols
    packed over distinct 8-stream groups of 32 KB chunks (tables built
    host-side once per chunk, outside the timed region, like the
    decode benches keep table build out)."""
    import jax.numpy as jnp
    import numpy as np
    from lizard_tpu.ops.enc_huf import henc_call, pack_streams
    from lizard_tpu.ref.huf_encode import (HUF_TABLELOG_DEFAULT,
                                           _fse_count,
                                           fse_optimal_table_log,
                                           huf_build_ctable)

    CH = 32768
    chunks = [data[i:i + CH] for i in range(0, len(data), CH)]
    chunks = chunks[:len(chunks) & ~7]
    groups = []
    for base in range(0, len(chunks), 8):
        grp = chunks[base:base + 8]
        tables = []
        for c in grp:
            count, max_sym, largest = _fse_count(c, 255)
            if largest == len(c):
                tables.append((np.zeros(256, np.int64),
                               np.zeros(256, np.int64)))
                continue
            hl = fse_optimal_table_log(HUF_TABLELOG_DEFAULT, len(c),
                                       max_sym, minus=1)
            nb, val, hl = huf_build_ctable(count, max_sym, hl)
            tables.append((val, nb))
        syms, tab, meta, stiles, otiles = pack_streams(grp, tables)
        groups.append((jnp.asarray(syms), jnp.asarray(tab),
                       jnp.asarray(meta), stiles, otiles))
    for g in groups:
        g[0].block_until_ready()

    def run():
        outs = [henc_call(s, t, m, st, ot)
                for (s, t, m, st, ot) in groups]
        outs[-1].block_until_ready()

    run()                                        # warm compile
    t0 = time.perf_counter()
    done = 0
    while time.perf_counter() - t0 < seconds:
        run()
        done += 8 * CH * len(groups)
    dt = time.perf_counter() - t0
    return done / dt / 1e9


def main():
    import jax

    data = build_corpus(CORPUS_MB << 20)

    gbps, ratio, iters, best_ms = bench_decode_level(
        data, LEVEL, BENCH_SECONDS)
    base = BASELINE_DECODE_MBPS.get(LEVEL, 2610) / 1000.0
    result = {
        "metric": f"decode_gbps_level{LEVEL}_1chip",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / base, 4),
    }
    print(f"# corpus={len(data)} ratio={ratio:.4f} iters={iters} "
          f"best={best_ms:.2f}ms il={IL} "
          f"backend={jax.default_backend()}", file=sys.stderr)

    if SWEEP:
        sweep = {str(LEVEL): {"gbps": round(gbps, 4),
                              "vs_baseline": round(gbps / base, 4),
                              "ratio": round(ratio, 4)}}
        for level in SWEEP_LEVELS:
            if level == LEVEL:
                continue
            try:
                extra = {}
                g, r, it, ms = bench_decode_level(
                    data, level, min(BENCH_SECONDS, 2.0), extra=extra)
                b = BASELINE_DECODE_MBPS.get(level, 2610) / 1000.0
                sweep[str(level)] = {"gbps": round(g, 4),
                                     "vs_baseline": round(g / b, 4),
                                     "ratio": round(r, 4), **extra}
                print(f"# L{level}: {g:.4f} GB/s best={ms:.2f}ms",
                      file=sys.stderr)
            except Exception as e:  # record, keep sweeping
                sweep[str(level)] = {"error": str(e)[:120]}
        result["sweep"] = sweep
        try:
            result["decode_sharded_dp1"] = bench_sharded_dp1(
                data, min(BENCH_SECONDS, 2.0))
            print(f"# sharded dp=1: {result['decode_sharded_dp1']}",
                  file=sys.stderr)
        except Exception as e:
            result["decode_sharded_dp1"] = {"error": str(e)[:120]}
        try:
            result["encode_mbps"] = bench_encode(data)
        except Exception as e:
            result["encode_mbps"] = {"error": str(e)[:120]}
        try:
            result["decode_native"] = bench_decode_native(data)
        except Exception as e:
            result["decode_native"] = {"error": str(e)[:120]}
        try:
            eg, er = bench_encode_tpu(data, min(BENCH_SECONDS, 2.0))
            result["encode_tpu"] = {"gbps": round(eg, 4),
                                    "ratio": round(er, 4)}
            print(f"# encode_tpu: {eg:.4f} GB/s ratio={er:.4f}",
                  file=sys.stderr)
        except Exception as e:
            result["encode_tpu"] = {"error": str(e)[:120]}
        try:
            lg, lr = bench_encode_lanes(data, min(BENCH_SECONDS, 3.0))
            result["encode_lanes"] = {"gbps": round(lg, 4),
                                      "ratio": round(lr, 4)}
            print(f"# encode_lanes: {lg:.4f} GB/s ratio={lr:.4f}",
                  file=sys.stderr)
        except Exception as e:
            result["encode_lanes"] = {"error": str(e)[:120]}
        try:
            hg = bench_huf_encode(data, min(BENCH_SECONDS, 2.0))
            result["huf_enc_tpu"] = {"gbps": round(hg, 4)}
            print(f"# huf_enc_tpu: {hg:.4f} GB/s", file=sys.stderr)
        except Exception as e:
            result["huf_enc_tpu"] = {"error": str(e)[:120]}

        # second corpus: real files (reference tree), decode GB/s + ratio
        # per level on the TPU path, mirroring the reference's
        # fixed-real-corpus discipline
        real = build_corpus_realfiles(
            int(os.environ.get("BENCH_REALFILES_MB", "16")) << 20)
        if real is not None:
            sweep_real = {}
            for level in SWEEP_LEVELS:
                try:
                    g, r, it, ms = bench_decode_level(real, level, 1.0)
                    b = BASELINE_DECODE_MBPS.get(level, 2610) / 1000.0
                    sweep_real[str(level)] = {
                        "gbps": round(g, 4), "vs_baseline": round(g / b, 4),
                        "ratio": round(r, 4)}
                    print(f"# real L{level}: {g:.4f} GB/s ratio={r:.4f}",
                          file=sys.stderr)
                except Exception as e:
                    sweep_real[str(level)] = {"error": str(e)[:120]}
            result["sweep_realfiles"] = {"bytes": len(real),
                                         "levels": sweep_real}

    print(json.dumps(result))


if __name__ == "__main__":
    main()
