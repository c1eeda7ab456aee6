"""Fused Huffman -> LZ decode pipeline: the huf128 kernel's decoded
bytes reach the lane decoder's stream pool WITHOUT a host round-trip.

The obstacle this solves: huf128 schedules each blob's four Huff0
segments onto cell chains, so their decoded bytes land in 8-row-aligned
regions scattered across the translate output (with per-episode junk
padding), while the lane decoder wants every stream as ONE contiguous
512-aligned pool segment. The COMPACT kernel bridges them: a byte-level
gather pass that rebuilds each Huffman stream contiguously inside the
lane pool (mode-1 rows), leaving host-filled raw-stream rows untouched
(the pool input is aliased to the output, so mode-0 rows cost nothing).

Flow (decompress_lanes_fused):
  host:   parse stream headers only (no entropy decode); lay out the
          lane pool with raw segments filled and Huffman segments as
          zero holes; build per-row compact metadata
  device: huf128 ranks -> translate symbols -> COMPACT into the pool
          -> lane decode            (one dispatch chain, no host syncs)

Per mode-1 pool row the metadata carries [mode, relbase, seg, orig,
s0..s3]: relbase = byte offset of the row within its blob, seg =
ceil(orig/4) (the Huff0 segment size, huf_decompress.c:231-321), s0..s3
= the four segments' byte positions in the translate output.

The kernel is VECTORIZED over 8 pool rows per grid step. Key structural
fact (prepare_huf128): every segment is contiguous and 512-aligned in
the translate output, so for a fixed segment the source row needed by
pool row r is `r + const` — the 8 rows of a grid block draw each
segment's bytes from one or two runs of 8 CONSECUTIVE source rows whose
j-th row serves exactly sublane j. The host enumerates those runs (at
most 8 per block; blocks that would need more — only possible with
several tiny blobs packed into one 8-row block — fall back to host
materialization of the offending blobs) and the kernel stages each run
with ONE 4 KB DMA, then gathers per byte plane with a per-sublane
take_along_axis + run-id match, merging mode-0 rows from the staged
pool tile. Per 8-row block: <=9 concurrent 4 KB DMAs + 32 vector
gathers, vs the scalar-per-row first version's 8 serialized 512 B DMAs
+ 32 gathers PER ROW (measured 1.4 s / 32 MB at level 41 on hardware;
this version is ~2 orders faster).

tm row-0 lanes 8..15 of each 8-row block carry the block's run starts
(-1 = unused slot), lane 16 the block-active flag.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shr(x, n):
    return jax.lax.shift_right_logical(x, n.astype(jnp.uint32))


def _compact_kernel(R, tm, src_hbm, pool_hbm, out_hbm, slots, pstage,
                    ostage, sems):
    """Grid step = 8 pool rows, fully vectorized. tm block (8,128):
    per row, lanes 0..7 = [mode, relbase, seg, orig, s0, s1, s2, s3];
    row 0 lanes 8..15 = the block's staged-run start rows (-1 unused),
    row 0 lane 16 = block-active flag."""
    pid = pl.program_id(0)
    active = tm[0, 16]

    @pl.when(active == 1)
    def _():
        lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        # stage the pool tile (mode-0 passthrough merge source) and the
        # <=8 consecutive-row source runs, all DMAs in flight at once
        cpp = pltpu.make_async_copy(pool_hbm.at[pl.ds(pid * 8, 8)],
                                    pstage, sems.at[1])
        cpp.start()
        n_runs = jnp.int32(0)
        for p in range(8):
            sp = tm[0, 8 + p]

            @pl.when(sp >= 0)
            def _(p=p, sp=sp):
                pltpu.make_async_copy(src_hbm.at[pl.ds(sp, 8)],
                                      slots.at[p], sems.at[0]).start()

            n_runs = n_runs + (sp >= 0).astype(jnp.int32)

        def wait_one(q, x):
            pltpu.make_async_copy(src_hbm.at[pl.ds(0, 8)],
                                  slots.at[0], sems.at[0]).wait()
            return x
        jax.lax.fori_loop(0, n_runs, wait_one, 0)
        cpp.wait()

        mode = tm[:, 0:1]
        relbase = tm[:, 1:2]
        seg = tm[:, 2:3]
        orig = tm[:, 3:4]
        subl = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        word = jnp.zeros((8, 128), jnp.int32)
        for k in range(4):
            rel = relbase + 4 * lanes + k
            # owning segment by boundary compares (no division): seg>=1
            # for mode-1 rows; mode-0 rows produce garbage that the
            # final mode select discards
            si = ((rel >= seg).astype(jnp.int32)
                  + (rel >= 2 * seg).astype(jnp.int32)
                  + (rel >= 3 * seg).astype(jnp.int32))
            si = jnp.minimum(si, 3)
            sbase = jnp.zeros((8, 128), jnp.int32)
            for q in range(4):
                sbase = jnp.where(si == q, tm[:, 4 + q:5 + q], sbase)
            src_byte = sbase + rel - si * seg
            srow = src_byte >> 9
            widx = (src_byte >> 2) & 127
            g = jnp.zeros((8, 128), jnp.int32)
            for p in range(8):
                sp = tm[0, 8 + p]
                gq = jnp.take_along_axis(slots[p], widx, axis=1)
                hit = srow == (sp + subl)
                g = jnp.where(hit, gq, g)
            byte = (_shr(g.astype(jnp.uint32),
                         ((src_byte & 3) << 3)) & 255).astype(jnp.int32)
            byte = jnp.where(rel < orig, byte, 0)
            word = word | (byte << (8 * k))

        ostage[...] = jnp.where(mode == 1, word, pstage[...])
        cpo = pltpu.make_async_copy(ostage,
                                    out_hbm.at[pl.ds(pid * 8, 8)],
                                    sems.at[2])
        cpo.start()
        cpo.wait()


@functools.partial(jax.jit, static_argnames=("R", "interpret"),
                   donate_argnums=(2,))
def _compact_call(tm, src, pool, R, interpret=False):
    """tm: (R, 128) i32 metadata, R = pool rows (8-row padded by
    build_fused_plan); src: translate output (out_rows, 128); pool: the
    lane pool with Huffman holes (DONATED — mode-1 rows are overwritten
    in place, mode-0 rows pass through via the aliased output)."""
    kernel = functools.partial(_compact_kernel, R)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(tm.shape[0] // 8,),
        in_specs=[pl.BlockSpec((8, 128), lambda g: (g, 0)),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, 8, 128), jnp.int32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pool.shape, jnp.int32),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tm, src, pool)


# ------------------------------------------------------------------ host

def build_fused_plan(streams, spb=None, groups=None, hgroups=None):
    """Host side of the fused pipeline: parse stream headers WITHOUT
    entropy-decoding, lay out the lane pool with Huffman holes, schedule
    the blobs on huf128, and build the compact metadata.

    Returns (lane, batch, hb, tm, pool) — hb is None when the batch has
    no Huffman streams (pool is final), or raises HufError/ValueError
    when the fused path cannot take the batch (caller falls back)."""
    from lizard_tpu.format.constants import (FLAG_FLAGS, FLAG_LITERALS,
                                             FLAG_OFFSET16, FLAG_OFFSET24,
                                             FLAG_UNCOMPRESSED)
    from lizard_tpu.format.levels import Codewords
    from lizard_tpu.ops import lane_decode as ld
    from lizard_tpu.ops.huf128 import pick_groups, prepare_huf128
    from lizard_tpu.ops.split import finalize, new_accumulator, split_stream

    if spb is None:
        spb = ld.SUPERS_PER_BLOCK
    if groups is None:
        groups = ld.GROUPS

    pend = []          # [blob, orig, block_idx, kind]
    acc = new_accumulator()

    def hd(blob, orig):
        pend.append([blob, orig, len(acc["stream_id"]), None])
        return np.zeros(orig, np.uint8)

    family = None
    for i, s in enumerate(streams):
        before = len(pend)
        f = split_stream(s, acc, i, hd)
        family = family or f
        if f != family:
            raise ValueError("mixed codeword families")
        # assign kinds by replaying headers (hd call order per block is
        # deterministic: off16, off24, flags, literals)
        k = before
        src = np.frombuffer(s, np.uint8)
        ip = 1
        while ip < len(src) and k < len(pend):
            header = int(src[ip])
            ip += 1
            if header == FLAG_UNCOMPRESSED:
                n = int(src[ip]) | int(src[ip + 1]) << 8 | \
                    int(src[ip + 2]) << 16
                ip += 3 + n
                continue
            for kind, bit in (("len", 0), ("off16", FLAG_OFFSET16),
                              ("off24", FLAG_OFFSET24),
                              ("flags", FLAG_FLAGS),
                              ("literals", FLAG_LITERALS)):
                if ip > len(src) - 3:
                    break
                if header & bit:
                    orig = int(src[ip]) | int(src[ip + 1]) << 8 | \
                        int(src[ip + 2]) << 16
                    comp = int(src[ip + 3]) | int(src[ip + 4]) << 8 | \
                        int(src[ip + 5]) << 16
                    if k < len(pend) and pend[k][1] == orig:
                        pend[k][3] = kind
                        k += 1
                    ip += 6 + comp
                else:
                    n = int(src[ip]) | int(src[ip + 1]) << 8 | \
                        int(src[ip + 2]) << 16
                    ip += 3 + n

    batch = finalize(acc, family or Codewords.LZ4)
    lane = ld.prepare_lane_batch(batch, groups=groups)
    if not pend:
        return lane, batch, None, None, lane.pool

    if any(p[3] in (None, "off16", "off24") for p in pend):
        raise ValueError("unfusable huffman layout")
    hg = hgroups or pick_groups(4 * len(pend))
    hb = prepare_huf128([(p[0], p[1]) for p in pend], groups=hg)

    C = lane.C
    R0 = lane.pool.shape[0]
    padR = ((R0 + 7) // 8) * 8        # full-tile DMAs need 8-row blocks
    pool = np.zeros((padR, 128), lane.pool.dtype)
    pool[:R0] = lane.pool
    nblocks = padR // 8
    src_rows = hb.out_rows            # prepare_huf128 pads >=8 guard rows

    entries = []                      # (row0, rows, seg, orig, ss4, pi)
    for pi, ((blob, orig, blk, kind), task) in enumerate(
            zip(pend, hb.tasks)):
        s, cpos = lane.placement[blk]
        if kind == "flags":
            row0 = int(lane.meta[cpos, s])
        else:
            row0 = int(lane.meta[2 * C + cpos, s])
        rows = (orig + 511) // 512
        if isinstance(task, tuple):          # RLE: host-materialized
            data = np.frombuffer(task[1], np.uint8)
            buf = np.zeros(rows * 512, np.uint8)
            buf[:orig] = data
            pool[row0:row0 + rows] = buf.view(np.int32).reshape(rows, 128)
            continue
        segs = sorted(task)                  # [(si, srcrow0, n_out)]
        assert len(segs) == 4
        seg = (orig + 3) // 4
        ss = [sg[1] * 512 for sg in segs]
        entries.append((row0, rows, seg, orig, ss, pi))

    # per-blob, per-block staged-run starts: segment k's source row for
    # pool row r is r + ((ss[k]-k*seg)>>9) - row0 (+1 across the 512
    # remainder), so each (block, segment) needs 1-2 runs of 8
    # consecutive source rows whose j-th row serves sublane j
    def blob_runs(row0, rows, seg, orig, ss):
        out = {}
        for q in range(rows):
            pid = (row0 + q) // 8
            lo_b, hi_b = q * 512, min(q * 512 + 512, orig)
            for k in range(min(lo_b // seg, 3),
                           min((hi_b - 1) // seg, 3) + 1):
                a = ss[k] - k * seg
                st = (a >> 9) - row0 + pid * 8
                sts = out.setdefault(pid, set())
                sts.add(st)
                if a & 511:
                    sts.add(st + 1)
        return out

    entry_runs = [blob_runs(row0, rows, seg, orig, ss)
                  for (row0, rows, seg, orig, ss, _) in entries]
    mat = set()      # entries host-materialized (blocks needing >8 runs
    while True:      # or out-of-range runs: only tiny-blob pileups)
        block_runs = [set() for _ in range(nblocks)]
        block_blobs = [set() for _ in range(nblocks)]
        for ei in range(len(entries)):
            if ei in mat:
                continue
            for pid, sts in entry_runs[ei].items():
                block_runs[pid] |= sts
                block_blobs[pid].add(ei)
        bad = [pid for pid in range(nblocks)
               if len(block_runs[pid]) > 8
               or any(st < 0 or st + 8 > src_rows
                      for st in block_runs[pid])]
        if not bad:
            break
        for pid in bad:
            mat |= block_blobs[pid]

    tm = np.zeros((padR, 128), np.int32)
    tm[:, 8:16] = -1
    if mat:
        from lizard_tpu.ref.huf import huf_decompress
    for ei, (row0, rows, seg, orig, ss, pi) in enumerate(entries):
        if ei in mat:
            data = np.frombuffer(huf_decompress(pend[pi][0], orig),
                                 np.uint8)
            buf = np.zeros(rows * 512, np.uint8)
            buf[:orig] = data
            pool[row0:row0 + rows] = buf.view(np.int32).reshape(rows, 128)
            continue
        for q in range(rows):
            r = row0 + q
            tm[r, 0] = 1
            tm[r, 1] = q * 512
            tm[r, 2] = seg
            tm[r, 3] = orig
            for k in range(4):
                tm[r, 4 + k] = ss[k]
    for pid in range(nblocks):
        sts = sorted(block_runs[pid])
        if not sts:
            continue
        tm[pid * 8, 16] = 1
        for p, st in enumerate(sts):
            tm[pid * 8, 8 + p] = st
    return lane, batch, hb, tm, pool


def decompress_lanes_fused(streams, interpret=False, spb=None, rtiles=None,
                           groups=None, il=1, hgroups=None):
    """decompress_lanes with the DEVICE-FUSED entropy stage: Huffman
    blobs never return to the host — huf128 ranks -> translate ->
    compact-into-pool -> lane decode is one on-device dispatch chain.
    Falls back to the host-staged path for batches the huf kernel
    cannot take (tableLog > 11) or all-raw batches decode directly."""
    from lizard_tpu.ops import lane_decode as ld
    from lizard_tpu.ops.huf128 import _huf128_call, _translate_call
    from lizard_tpu.ref.huf import HufError

    if spb is None:
        spb = ld.SUPERS_PER_BLOCK
    if groups is None:
        groups = ld.GROUPS
    try:
        lane, batch, hb, tm, pool = build_fused_plan(
            streams, spb=spb, groups=groups, hgroups=hgroups)
    except (HufError, ValueError):
        from lizard_tpu.ops.lane_decode import decompress_lanes
        return decompress_lanes(streams, interpret=interpret, spb=spb,
                                rtiles=rtiles, groups=groups, il=il,
                                entropy="host")
    if rtiles is None:
        rtiles = ld.LIZ_RING_TILES if lane.family else ld.RING_TILES
    T = lane.C * spb

    if hb is None:
        out = ld._lane_call(jnp.asarray(pool), jnp.asarray(lane.meta),
                            C=lane.C, T=T, spb=spb, rtiles=rtiles,
                            groups=groups, il=il, family=lane.family,
                            interpret=interpret)
        return _unpack(out, lane, batch, T, spb, groups)

    # device chain: ranks -> symbols -> compact -> lane decode
    ranks = _huf128_call(jnp.asarray(hb.meta_s), jnp.asarray(hb.vmeta),
                         jnp.asarray(hb.pool), T=hb.T, groups=hb.groups,
                         il=hb.groups, out_rows=hb.out_rows,
                         interpret=interpret)
    syms = _translate_call(jnp.asarray(hb.tmeta), ranks,
                           jnp.asarray(hb.luts), interpret=interpret)
    fused_pool = _compact_call(jnp.asarray(tm), syms, jnp.asarray(pool),
                               R=pool.shape[0], interpret=interpret)
    out = ld._lane_call(fused_pool, jnp.asarray(lane.meta), C=lane.C, T=T,
                        spb=spb, rtiles=rtiles, groups=groups, il=il,
                        family=lane.family, interpret=interpret)
    return _unpack(out, lane, batch, T, spb, groups)


def _unpack(out, lane, batch, T, spb, groups):
    from lizard_tpu.ops import lane_decode as ld
    blocks = ld.unpack_lane_output(np.asarray(out), lane, T, spb=spb,
                                   groups=groups)
    if any(b is None for b in blocks):
        raise ValueError("far-window overflow on the fused path")
    outs = []
    i = 0
    for sid in range(int(batch.stream_id.max()) + 1 if batch.n_blocks
                     else 0):
        parts = []
        while i < batch.n_blocks and batch.stream_id[i] == sid:
            parts.append(blocks[i])
            i += 1
        outs.append(b"".join(parts))
    return outs
