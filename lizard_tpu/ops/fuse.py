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
= the four segments' byte positions in the translate output. The kernel
computes, per byte, which segment serves it and gathers through up to 8
candidate source rows (two per segment) staged by DMA.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shr(x, n):
    return jax.lax.shift_right_logical(x, n.astype(jnp.uint32))


def _compact_kernel(R, tm, src_hbm, pool_hbm, out_hbm, slots, stage, sems):
    """Grid step = 8 pool rows. tm block (8,128): per row, lanes 0..7 =
    [mode, relbase, seg, orig, s0, s1, s2, s3]."""
    pid = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    for j in range(8):
        r = pid * 8 + j
        mode = tm[j, 0]

        @pl.when((mode == 1) & (r < R))
        def _(j=j, r=r):
            relbase = tm[j, 1]
            seg = tm[j, 2]
            orig = tm[j, 3]
            ss = [tm[j, 4 + k] for k in range(4)]

            # stage up to 2 source rows per segment (slots 2k, 2k+1)
            n_dma = 0
            for k in range(4):
                lo = jnp.maximum(relbase, k * seg)
                hi = jnp.minimum(jnp.minimum(relbase + 512, (k + 1) * seg),
                                 orig)
                have = hi > lo
                r0 = (ss[k] + (lo - k * seg)) >> 9
                r1 = (ss[k] + jnp.maximum(hi - 1 - k * seg, 0)) >> 9

                @pl.when(have)
                def _(k=k, r0=r0, r1=r1):
                    pltpu.make_async_copy(
                        src_hbm.at[pl.ds(r0, 1)],
                        slots.at[pl.ds(2 * k, 1)], sems.at[0]).start()
                    pltpu.make_async_copy(
                        src_hbm.at[pl.ds(jnp.maximum(r1, r0), 1)],
                        slots.at[pl.ds(2 * k + 1, 1)], sems.at[1]).start()

                n_dma = n_dma + have.astype(jnp.int32)

            def wait_one(q, x):
                pltpu.make_async_copy(src_hbm.at[pl.ds(0, 1)],
                                      slots.at[pl.ds(0, 1)],
                                      sems.at[0]).wait()
                pltpu.make_async_copy(src_hbm.at[pl.ds(0, 1)],
                                      slots.at[pl.ds(0, 1)],
                                      sems.at[1]).wait()
                return x
            jax.lax.fori_loop(0, n_dma, wait_one, 0)

            # per byte plane: owning segment, source byte, slot gather
            word = jnp.zeros((8, 128), jnp.int32)
            segf = jnp.maximum(seg, 1).astype(jnp.float32)
            for k in range(4):
                rel = relbase + 4 * lanes + k
                si = jnp.clip((rel.astype(jnp.float32) / segf)
                              .astype(jnp.int32), 0, 3)
                si = jnp.where(rel - si * seg < 0, si - 1, si)
                si = jnp.where(rel - (si + 1) * seg >= 0, si + 1, si)
                si = jnp.clip(si, 0, 3)
                within = rel - si * seg
                sbase = jnp.zeros((8, 128), jnp.int32)
                for q in range(4):
                    sbase = jnp.where(si == q, ss[q], sbase)
                src_byte = sbase + within
                srow = src_byte >> 9
                widx = (src_byte >> 2) & 127
                # slot select: segment q's rows are at slots 2q/2q+1;
                # parity = whether src row equals the staged r0 or r1
                g = jnp.zeros((8, 128), jnp.int32)
                for q in range(4):
                    lo_q = jnp.maximum(relbase, q * seg)
                    r0_q = (ss[q] + (lo_q - q * seg)) >> 9
                    for p in range(2):
                        rowv = jnp.broadcast_to(
                            slots[pl.ds(2 * q + p, 1)], (8, 128))
                        gq = jnp.take_along_axis(rowv, widx, axis=1)
                        hit = (si == q) & ((srow == r0_q) == (p == 0))
                        g = jnp.where(hit, gq, g)
                byte = (_shr(g.astype(jnp.uint32),
                             ((src_byte & 3) << 3)) & 255).astype(jnp.int32)
                byte = jnp.where(rel < orig, byte, 0)
                word = word | (byte << (8 * k))

            stage[pl.ds(0, 1)] = word[0:1]
            cp = pltpu.make_async_copy(stage.at[pl.ds(0, 1)],
                                       out_hbm.at[pl.ds(r, 1)], sems.at[2])
            cp.start()
            cp.wait()


@functools.partial(jax.jit, static_argnames=("R", "interpret"),
                   donate_argnums=(2,))
def _compact_call(tm, src, pool, R, interpret=False):
    """tm: (ceil8(R), 128) i32 metadata; src: translate output
    (out_rows, 128); pool: the lane pool with Huffman holes (DONATED —
    mode-1 rows are overwritten in place, mode-0 rows pass through)."""
    kernel = functools.partial(_compact_kernel, R)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(tm.shape[0] // 8,),
        in_specs=[pl.BlockSpec((8, 128), lambda g: (g, 0)),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
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
    pool = lane.pool.copy()
    R = pool.shape[0]
    tm = np.zeros((((R + 7) // 8) * 8, 128), np.int32)
    for (blob, orig, blk, kind), task in zip(pend, hb.tasks):
        s, cpos = lane.placement[blk]
        if kind == "flags":
            row0 = int(lane.meta[cpos, s])
        else:
            row0 = int(lane.meta[2 * C + cpos, s])
        if isinstance(task, tuple):          # RLE: host-materialized
            data = np.frombuffer(task[1], np.uint8)
            rows = (orig + 511) // 512
            buf = np.zeros(rows * 512, np.uint8)
            buf[:orig] = data
            pool[row0:row0 + rows] = buf.view(np.int32).reshape(rows, 128)
            continue
        segs = sorted(task)                   # [(si, srcrow0, n_out)]
        assert len(segs) == 4
        seg = (orig + 3) // 4
        rows = (orig + 511) // 512
        for q in range(rows):
            r = row0 + q
            tm[r, 0] = 1
            tm[r, 1] = q * 512
            tm[r, 2] = seg
            tm[r, 3] = orig
            for k in range(4):
                tm[r, 4 + k] = segs[k][1] * 512
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
