"""Multi-chip decode pipeline: independent compressed streams (frame blocks
in blockIndependent mode) scattered data-parallel over a jax.sharding.Mesh,
decoded locally per chip, gathered in frame order.

This is the TPU mapping of the format's top-level parallel unit
(SURVEY.md §2.5): independent frame blocks are self-contained, so the only
cross-device communication is the ordered ragged gather of outputs.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lizard_tpu.format.levels import Codewords
from lizard_tpu.ops.decode import GUARD, resolve_output, token_parse_liz, token_parse_lz4
from lizard_tpu.ops.split import finalize, new_accumulator, split_stream


def make_sharded_decoder(mesh: Mesh, *, out_cap, max_steps, max_tokens_total,
                         family_liz, gather_lengths=False):
    """Build the jitted multi-chip decode step for fixed shard geometry.
    Arrays are [n_shards, ...]; each device decodes its shard locally
    (pure data parallel; the final gather rides the output sharding).

    gather_lengths=True additionally ALL-GATHERS the per-block decoded
    lengths across the mesh inside the step (SURVEY.md section 2.5's
    block-size all-gather): every shard -- and on a multi-host pod, every
    process -- then knows the global output offset of each block without a
    host round-trip. The collective rides ICI on real hardware."""

    out_specs = (P("dp"), P("dp")) + ((P(None), P(None))
                                      if gather_lengths else ())

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("dp"),) * 10,
        out_specs=out_specs,
        # the gathered-lengths outputs are replicated by construction
        # (all_gather); skip the static varying-axes check that cannot
        # see through the cumsum on the gathered value
        check_vma=not gather_lengths,
    )
    def _sharded(flags, lit, off16, off24, flags_off, flags_len,
                 lit_off, lit_len, off16_off, off24_off):
        if family_liz:
            ll, ml, off, lit_start = token_parse_liz(
                flags[0], lit[0], off16[0], off24[0], flags_off[0],
                flags_len[0], lit_off[0], lit_len[0], off16_off[0],
                off24_off[0], max_steps)
        else:
            ll, ml, off, lit_start = token_parse_lz4(
                flags[0], lit[0], flags_off[0], flags_len[0], lit_off[0],
                lit_len[0], max_steps)
        out, blk_len = resolve_output(ll, ml, off, lit_start, flags_len[0],
                                      lit[0], out_cap, max_tokens_total)
        if not gather_lengths:
            return out[None], blk_len[None]
        # [n_shards, bmax] lengths on every shard + exclusive global offsets
        all_len = jax.lax.all_gather(blk_len, "dp")
        flat = all_len.reshape(-1)
        offs = (jnp.cumsum(flat) - flat).reshape(all_len.shape)
        return out[None], blk_len[None], all_len, offs

    return jax.jit(_sharded)


def _pad_to(a, n, dtype):
    out = np.zeros(n, dtype)
    out[:len(a)] = a
    return out


def _group(n_items: int, n_shards: int):
    """Contiguous balanced grouping preserving order."""
    return [i * n_shards // max(n_items, 1) for i in range(n_items)]


def decode_streams_sharded(streams: list[bytes], max_stream_out: int,
                           mesh: Mesh | None = None) -> list[bytes]:
    """Decode independent compressed streams across the mesh. Returns the
    decompressed bytes per stream, in input order. `max_stream_out` bounds
    any single stream's decompressed size (frame maxBlockSize)."""
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), ("dp",))
    n_shards = int(mesh.devices.size)
    if not streams:
        return []

    assign = _group(len(streams), n_shards)
    shard_batches = []
    shard_streams_idx = [[] for _ in range(n_shards)]
    for s in range(n_shards):
        acc = new_accumulator()
        fam = None
        for i, stream in enumerate(streams):
            if assign[i] == s:
                fam = split_stream(stream, acc, i)
                shard_streams_idx[s].append(i)
        shard_batches.append(finalize(acc, fam or Codewords.LIZv1))

    family = next((b.codewords for b in shard_batches if b.n_blocks),
                  Codewords.LZ4)
    bmax = max(max((b.n_blocks for b in shard_batches), default=1), 1)
    caps = [max(max((len(getattr(b, f)) for b in shard_batches), default=1), 1)
            + GUARD for f in ("flags", "literals", "off16", "off24")]
    max_steps = max(max((b.max_tokens for b in shard_batches), default=0), 1)
    max_tokens_total = max(max((int((b.flags_len + 1).sum())
                                for b in shard_batches if b.n_blocks),
                               default=1), bmax + 1)
    out_cap = max(max(len(g) for g in shard_streams_idx), 1) * max_stream_out

    def stack_u8(field, cap):
        return np.stack([_pad_to(getattr(b, field), cap, np.uint8)
                         for b in shard_batches])

    def stack_i32(field):
        return np.stack([_pad_to(getattr(b, field), bmax, np.int32)
                         for b in shard_batches])

    # padded (inactive) block rows get flags_len = -1 so neither real tokens
    # nor the trailing-literals pseudo token fire for them
    flags_len = np.stack([
        np.where(np.arange(bmax) < b.n_blocks,
                 _pad_to(b.flags_len, bmax, np.int32), -1).astype(np.int32)
        for b in shard_batches])

    arrays = (stack_u8("flags", caps[0]), stack_u8("literals", caps[1]),
              stack_u8("off16", caps[2]), stack_u8("off24", caps[3]),
              stack_i32("flags_off"), flags_len,
              stack_i32("lit_off"), stack_i32("lit_len"),
              stack_i32("off16_off"), stack_i32("off24_off"))

    decoder = make_sharded_decoder(mesh, out_cap=int(out_cap),
                                   max_steps=int(max_steps),
                                   max_tokens_total=int(max_tokens_total),
                                   family_liz=family == Codewords.LIZv1)
    sharding = NamedSharding(mesh, P("dp"))
    out, blk_len = decoder(*[jax.device_put(a, sharding) for a in arrays])
    out = np.asarray(out)
    blk_len = np.asarray(blk_len)

    # ragged per-stream reassembly: per-block lengths + block->stream map
    results: list[bytes] = [b""] * len(streams)
    for s, batch in enumerate(shard_batches):
        pos = 0
        pieces: dict[int, list[bytes]] = {}
        for bidx in range(batch.n_blocks):
            ln = int(blk_len[s, bidx])
            pieces.setdefault(int(batch.stream_id[bidx]), []).append(
                out[s, pos:pos + ln].tobytes())
            pos += ln
        for sid, chunks in pieces.items():
            results[sid] = b"".join(chunks)
    return results


def decode_frame_sharded(frame: bytes, mesh: Mesh | None = None) -> bytes:
    """Decode a blockIndependent frame with its blocks scattered over the
    mesh; stored blocks are spliced on the host; frame order preserved."""
    from lizard_tpu.format.constants import (
        LIZARDF_BLOCK_SIZES,
        LIZARDF_BLOCKUNCOMPRESSED_FLAG,
    )
    from lizard_tpu.frame import FrameError, parse_frame_header
    from lizard_tpu.utils.xxh import xxh32

    info = parse_frame_header(frame)
    if info.block_linked:
        raise FrameError("sharded decode requires independent blocks")
    max_block = LIZARDF_BLOCK_SIZES[info.block_size_id]
    p = info.header_size
    units = []
    while True:
        if p + 4 > len(frame):
            raise FrameError("missing endmark")
        bsize = int.from_bytes(frame[p:p + 4], "little")
        p += 4
        if bsize == 0:
            break
        stored = bool(bsize & LIZARDF_BLOCKUNCOMPRESSED_FLAG)
        bsize &= ~LIZARDF_BLOCKUNCOMPRESSED_FLAG
        units.append(("raw" if stored else "comp", frame[p:p + bsize]))
        p += bsize
    crc = int.from_bytes(frame[p:p + 4], "little") if info.content_checksum else None

    comp_streams = [u[1] for u in units if u[0] == "comp"]
    decoded = decode_streams_sharded(comp_streams, max_block, mesh)

    out = bytearray()
    ci = 0
    for kind, payload in units:
        if kind == "raw":
            out += payload
        else:
            out += decoded[ci]
            ci += 1
    if crc is not None and xxh32(bytes(out)) != crc:
        raise FrameError("content checksum mismatch")
    return bytes(out)


# ------------------------------------------------------------------ encode

def make_sharded_encoder(mesh: Mesh, cfg, interpret=False):
    """Jitted multi-chip ENCODE step for the Pallas lane pipeline:
    each device runs phase 1 (+ phase 1.5 for chain tiers) + pass A on
    its own group of 8 blocks (pure data parallel — groups are
    independent, SURVEY.md section 2.5); the host then runs pass B
    (emission) per block. Inputs are [n_shards, ...] stacked
    pack_blocks outputs; output is [n_shards, tok_rows, 128]."""
    import dataclasses
    import functools as ft

    from lizard_tpu.ops.enc_lanes import p1_call, p15_call, pA_call

    pa_cfg = dataclasses.replace(cfg, chain=0) if cfg.chain else cfg

    @ft.partial(jax.shard_map, mesh=mesh, in_specs=(P("dp"), P("dp")),
                out_specs=P("dp"), check_vma=False)
    def step(w32, meta):
        pk = p1_call(w32[0], meta[0], cfg, interpret=interpret)
        if cfg.chain:
            pk = p15_call(w32[0], pk, meta[0], cfg, interpret=interpret)
        tok = pA_call(w32[0], pk, meta[0], pa_cfg, interpret=interpret)
        return tok[None]

    return jax.jit(step)


def encode_blocks_sharded(blocks, level=10, cfg=None, mesh: Mesh = None,
                          interpret=None):
    """Compress up-to-128 KB blocks data-parallel over the mesh (one
    8-block group per device per step). Same output contract as
    ops/enc_lanes.encode_blocks_lanes: one container stream (level
    byte + inner block) per input, decodable by liblizard."""
    from lizard_tpu.ops.enc_lanes import (cfg_for_level, emit_inner,
                                          pack_blocks,
                                          unpack_token_arrays)

    if cfg is None:
        cfg = cfg_for_level(level)
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), ("dp",))
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    S = mesh.devices.size
    step = make_sharded_encoder(mesh, cfg, interpret=interpret)

    groups = [blocks[i:i + 8] for i in range(0, len(blocks), 8)]
    res = []
    for base in range(0, len(groups), S):
        batch = groups[base:base + S]
        while len(batch) < S:                    # pad the last step
            batch = batch + [[b""]]
        packs = [pack_blocks(g, cfg) for g in batch]
        W = np.stack([w for w, _ in packs])
        M = np.stack([m for _, m in packs])
        toks = np.asarray(step(jnp.asarray(W), jnp.asarray(M)))
        for s, grp in enumerate(groups[base:base + S]):
            try:
                arrs = unpack_token_arrays(toks[s], cfg)
            except Exception:
                # token-buffer overflow (pathological density) or a
                # device-side failure: this group re-encodes on host
                from lizard_tpu.ops.enc_lanes import _fallback_inner
                res.extend(bytes([level]) + _fallback_inner(d, level)
                           for d in grp)
                continue
            for k, d in enumerate(grp):
                st, ml, off = arrs[k]
                res.append(bytes([level]) + emit_inner(d, st, ml, off,
                                                       level))
    return res


def decode_streams_sharded_lanes(streams: list[bytes], mesh: Mesh,
                                 interpret=False, spb=None, rtiles=None,
                                 groups=None, il=4, entropy="host"):
    """Decode independent compressed streams with the PRODUCTION Pallas
    lane kernel (ops/lane_decode._lane_call — the same kernel the
    single-chip bench times) under shard_map over the mesh's dp axis:
    shard_map adds only the dp scatter and the ordered output gather
    (the format's only cross-device communication, SURVEY.md §2.5).

    Streams are grouped contiguously per device; every device runs one
    kernel instance over its shard's lane batch. All shards must share
    one codeword family and schedule to equal chain depth C (independent
    frame blocks give C=1). Returns the decoded bytes per stream."""
    from lizard_tpu.ops.lane_decode import (
        GROUPS, LIZ_RING_TILES, RING_TILES, SUPERS_PER_BLOCK, _lane_call,
        prepare_lane_batch, unpack_lane_output)
    from lizard_tpu.ops.split import split_streams

    if spb is None:
        spb = SUPERS_PER_BLOCK
    if groups is None:
        groups = GROUPS
    n = int(mesh.devices.size)
    bounds = [len(streams) * k // n for k in range(n + 1)]
    shards = [streams[bounds[k]:bounds[k + 1]] for k in range(n)]

    lanes, batches = [], []
    fam = None
    for shard in shards:
        batch = split_streams(shard, entropy=entropy)
        lane = prepare_lane_batch(batch, groups=groups)
        if batch.n_blocks:
            if fam is None:
                fam = lane.family
            elif fam != lane.family:
                raise ValueError("mixed codeword families across shards")
        lanes.append(lane)
        batches.append(batch)
    fam = fam or 0
    C = max(lane.C for lane in lanes)
    if any(lane.C not in (1, C) for lane in lanes):
        raise ValueError("unequal chain depths across shards")
    for lane in lanes:
        if lane.C != C:       # only possible for empty/short shards
            raise ValueError("unequal chain depths across shards")
    if rtiles is None:
        rtiles = LIZ_RING_TILES if fam else RING_TILES
    T = C * spb

    R = max(lane.pool.shape[0] for lane in lanes)
    pool = np.zeros((n, R, 128), np.int32)
    metas = []
    for k, lane in enumerate(lanes):
        pool[k, :lane.pool.shape[0]] = lane.pool
        m = lane.meta
        want_rows = (6 if fam else 4) * C
        if m.shape[0] != want_rows:      # empty shard of the other family
            m2 = np.full((want_rows, 128), -1, np.int32)
            m2[0:2 * C] = 0
            if fam:
                m2[4 * C:] = 0
            m = m2
        metas.append(m)
    meta = np.stack(metas)

    # check_vma=False: pallas_call out_shapes carry no vma annotation
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("dp"), P("dp")), out_specs=P("dp"),
                       check_vma=False)
    def step(pool_s, meta_s):
        return _lane_call(pool_s[0], meta_s[0], C=C, T=T, spb=spb,
                          rtiles=rtiles, groups=groups, il=il, family=fam,
                          interpret=interpret)[None]

    out = np.asarray(jax.jit(step)(jnp.asarray(pool), jnp.asarray(meta)))

    results = []
    for k, (lane, batch) in enumerate(zip(lanes, batches)):
        blocks = unpack_lane_output(out[k], lane, T, spb=spb, groups=groups)
        if any(b is None for b in blocks):
            raise ValueError("far-window overflow in sharded decode")
        i = 0
        for sid in range(int(batch.stream_id.max()) + 1
                         if batch.n_blocks else 0):
            parts = []
            while i < batch.n_blocks and batch.stream_id[i] == sid:
                parts.append(blocks[i])
                i += 1
            results.append(b"".join(parts))
    return results
