"""TPU-native fastLZ4 encoder: batched match finding + parse + emission.

The reference's fast parser (lib/lizard_parser_fast.h:41-196) walks a
hash table serially byte by byte — a shape the TPU can't pipeline. This
encoder reformulates the whole compression pipeline as dense batched
array ops so XLA can tile it onto the vector units:

1. MATCH FINDING BY STABLE SORT (no hash table, no scatter): hash4 every
   position, stable-argsort by hash bucket (ties keep position order) —
   each position's sorted predecessor with the same hash IS its nearest
   previous occurrence. The permutation is inverted with a second
   argsort, so the gather-only pipeline never scatters. Candidates are
   verified with a 4-byte compare (collisions drop out) and extended by
   fixed word-compare rounds.

2. CHUNK-PARALLEL GREEDY PARSE: the block is cut into CHUNK-byte spans;
   matches are capped at their chunk's end, which makes every chunk's
   greedy token walk independent (the serial dependency of LZ parsing
   never crosses a chunk). All chunks of all blocks walk simultaneously:
   one fori_loop of CHUNK steps advances a (B, n_chunks) cursor vector.
   Literal runs still span chunks — a chunk with no chosen match start
   contributes its bytes to the next token's literal run — so the only
   format cost of the cut is truncated long matches (~1-3% ratio vs the
   reference's unbounded greedy; see bench).

3. GATHER-BASED EMISSION: chosen match starts compact to a token list
   via one more stable argsort; per-token stream sizes prefix-sum into
   stream offsets; then every output byte of the literal stream finds
   its (token, role) by branchless binary search and gathers its value —
   the exact inverse of the lane decoder's placement trick
   (ops/lane_decode.py).

Output is byte-compatible with the fastLZ4 block container
(lizard_compress.c:186-250, lizard_compress_lz4.h:3-71): token =
ll | (ml-4)<<4, literal stream holds [ext-ll][literals][off16 LE]
[ext-ml] per token, ext lengths <254 / 254+LE16 / 255+LE24, last-16-
bytes-literal and match-start-before-end-20 rules enforced. Streams
decode with liblizard and every decoder in this repo (interop-tested).

MEASURED STATUS (v5e, Aug 2026): ratio 0.5647 on the bench corpus
(better than the reference -10's 0.5757 and the native C++ encoder's
0.544 at -11) but only ~1.2 MB/s wall — XLA's general gather/argsort on
(8, 131072) arrays runs ~1e8 elem/s on this hardware (only (8,128)
in-lane gathers are native; see tools/probe_primitives.py), and the
pipeline is ~80 such passes. A fast TPU encoder therefore needs this
same dataflow rebuilt as a Pallas kernel with tile-local gathers, the
round-3 project; this module stands as the algorithm reference and the
ratio/validity baseline for it.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lizard_tpu.format.constants import (
    LASTLITERALS,
    MFLIMIT,
    MINMATCH,
    LIZARD_MIN_LENGTH,
)

N = 131072                  # padded block size (one 128 KB inner block)
CHUNK = 128                 # parse-chunk bytes (walk steps per block)
NCH = N // CHUNK
MAXTOK = N // MINMATCH      # token capacity
HASHLOG = 17
EXT_ROUNDS = 34             # word-compare rounds: 4+4*33+3 >= CHUNK+3
RUN_MASK = 15
ML_MASK = 15


@functools.partial(jax.jit, static_argnames=("min_offset",))
def _encode_batch(u8, n, min_offset=8):
    """u8: (B, N) uint8 zero-padded. n: (B,) actual lengths.
    Returns flags (B, MAXTOK) u8, ntok (B,), lits (B, LMAX) u8,
    lit_len (B,), tail_start (B,)."""
    B = u8.shape[0]
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    nn = n[:, None].astype(jnp.int32)

    u = u8.astype(jnp.uint32)
    w = (u | jnp.roll(u, -1, axis=1) << 8 | jnp.roll(u, -2, axis=1) << 16
         | jnp.roll(u, -3, axis=1) << 24)
    h = ((w * jnp.uint32(2654435761)) >> jnp.uint32(32 - HASHLOG)
         ).astype(jnp.int32)

    # nearest previous occurrence via stable sort (see module doc)
    sidx = jnp.argsort(h, axis=1, stable=True)
    inv = jnp.argsort(sidx, axis=1)
    hs = jnp.take_along_axis(h, sidx, axis=1)
    prev = jnp.roll(sidx, 1, axis=1)
    same = (hs == jnp.roll(hs, 1, axis=1)) & (jnp.arange(N)[None, :] > 0)
    cand_sorted = jnp.where(same, prev, -1)
    cand = jnp.take_along_axis(cand_sorted, inv, axis=1)

    safe_c = jnp.clip(cand, 0, N - 1)
    off = pos - safe_c
    valid = ((cand >= 0) & (off >= min_offset) & (off <= 65535)
             & (jnp.take_along_axis(w, safe_c, axis=1) == w)
             & (pos < nn - MFLIMIT) & (nn >= LIZARD_MIN_LENGTH))

    # word-compare extension, byte-exact via the first mismatching word.
    # UNROLLED on purpose: the lax.fori_loop formulation compiled 30x
    # faster but executed ~40x slower on the TPU runtime here and hung
    # sporadically; the unrolled build is slow to compile once and then
    # served by the persistent compile cache (see _enable_jax_compile_
    # cache in lizard_tpu/__init__.py).
    ml = jnp.full((B, N), MINMATCH, jnp.int32)
    live = valid
    extra = jnp.zeros((B, N), jnp.int32)
    for r in range(1, EXT_ROUNDS):
        a = jnp.take_along_axis(w, jnp.minimum(pos + 4 * r, N - 1), axis=1)
        b = jnp.take_along_axis(w, jnp.minimum(safe_c + 4 * r, N - 1),
                                axis=1)
        x = a ^ b
        eq = (x == 0) & live
        tz = jnp.where((x & 0xFF) == 0,
                       jnp.where((x & 0xFFFF) == 0,
                                 jnp.where((x & 0xFFFFFF) == 0, 3, 2), 1), 0)
        extra = jnp.where(live & ~eq, tz, extra)
        ml = ml + jnp.where(eq, 4, 0)
        live = eq
    ml = ml + jnp.where(live, 0, extra) * valid
    # cap: stay inside the chunk and leave the last 16 bytes literal
    ml = jnp.minimum(ml, CHUNK - (pos % CHUNK))
    ml = jnp.minimum(ml, nn - LASTLITERALS - pos)
    has_m = valid & (ml >= MINMATCH)

    # ---- chunk-parallel greedy walk ----
    mlc = jnp.where(has_m, ml, 0).reshape(B, NCH, CHUNK)
    p0 = jnp.zeros((B, NCH), jnp.int32)
    bits = jnp.zeros((B, NCH, CHUNK // 32), jnp.int32)

    def step(_, st):
        p, bits = st
        pc = jnp.minimum(p, CHUNK - 1)[..., None]
        m = jnp.take_along_axis(mlc, pc, axis=2)[..., 0]
        act = p < CHUNK
        hit = act & (m >= MINMATCH)
        wsel = p >> 5
        bset = jnp.where(hit[..., None] & (
            wsel[..., None] == jnp.arange(CHUNK // 32)[None, None, :]),
            jnp.left_shift(jnp.int32(1), (p & 31)[..., None]), 0)
        bits = bits | bset
        adv = jnp.where(hit, m, jnp.where(act, 1, 0))
        return p + adv, bits

    _, bits = jax.lax.fori_loop(0, CHUNK, step, (p0, bits))
    chosen = ((bits[..., :, None] >> jnp.arange(32)[None, None, None, :])
              & 1).astype(jnp.bool_).reshape(B, N)

    # ---- tokenization ----
    ntok = jnp.sum(chosen, axis=1).astype(jnp.int32)
    order = jnp.argsort(~chosen, axis=1, stable=True)[:, :MAXTOK]
    tok_i = jnp.arange(MAXTOK, dtype=jnp.int32)[None, :]
    tval = tok_i < ntok[:, None]
    starts = jnp.where(tval, order, 0)
    mlt = jnp.where(tval, jnp.take_along_axis(
        jnp.where(has_m, ml, 0), starts, axis=1), 0)
    offt = jnp.where(tval, starts - jnp.take_along_axis(
        safe_c, starts, axis=1), 1)
    ends = starts + mlt
    prev_end = jnp.where(tok_i > 0,
                         jnp.roll(ends, 1, axis=1), 0)
    ll = jnp.where(tval, starts - prev_end, 0)

    mlx = mlt - MINMATCH
    flag = (jnp.minimum(ll, RUN_MASK)
            | (jnp.minimum(mlx, ML_MASK) << 4)).astype(jnp.uint8)
    flags = jnp.where(tval, flag, 0)

    def ext_len(v, present):
        return jnp.where(
            present,
            jnp.where(v < 254, 1, jnp.where(v < (1 << 16), 3, 4)), 0)

    vll = ll - RUN_MASK
    vml = mlx - ML_MASK
    ell = ext_len(vll, tval & (ll >= RUN_MASK))
    eml = ext_len(vml, tval & (mlx >= ML_MASK))
    tsz = jnp.where(tval, ell + ll + 2 + eml, 0)
    tok_off = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(tsz, axis=1)], axis=1)
    body_len = tok_off[jnp.arange(B), ntok]
    last_end = jnp.where(ntok > 0,
                         jnp.take_along_axis(
                             ends, jnp.maximum(ntok - 1, 0)[:, None],
                             axis=1)[:, 0], 0)
    tail_ll = n.astype(jnp.int32) - last_end
    lit_len = body_len + tail_ll

    # ---- literal-stream emission (binary search per output byte) ----
    LMAX = N + N // 4
    o = jnp.arange(LMAX, dtype=jnp.int32)[None, :]
    j = jnp.zeros((B, LMAX), jnp.int32)
    for k in (16384, 8192, 4096, 2048, 1024, 512, 256, 128, 64, 32, 16,
              8, 4, 2, 1):
        m2 = jnp.minimum(j + k, MAXTOK)
        e = jnp.take_along_axis(tok_off, m2, axis=1)
        j = jnp.where(e <= o, m2, j)
    in_body = o < body_len[:, None]
    jc = jnp.minimum(j, MAXTOK - 1)
    r = o - jnp.take_along_axis(tok_off, jc, axis=1)

    ell_j = jnp.take_along_axis(ell, jc, axis=1)
    ll_j = jnp.take_along_axis(ll, jc, axis=1)
    pe_j = jnp.take_along_axis(prev_end, jc, axis=1)
    off_j = jnp.take_along_axis(offt, jc, axis=1)
    vll_j = jnp.take_along_axis(vll, jc, axis=1)
    vml_j = jnp.take_along_axis(vml, jc, axis=1)

    def ext_byte(v, elen, r):
        first = jnp.where(elen == 1, v,
                          jnp.where(elen == 3, 254, 255))
        return jnp.where(r == 0, first, (v >> ((r - 1) * 8)) & 255)

    b_ell = ext_byte(vll_j, ell_j, r)
    r2 = r - ell_j
    lit_src = jnp.clip(pe_j + r2, 0, N - 1)
    b_lit = jnp.take_along_axis(u8, lit_src, axis=1).astype(jnp.int32)
    r3 = r2 - ll_j
    b_off = jnp.where(r3 == 0, off_j & 255, off_j >> 8)
    r4 = r3 - 2
    b_eml = ext_byte(vml_j, eml_len := jnp.take_along_axis(eml, jc, axis=1),
                     r4)
    body = jnp.where(r < ell_j, b_ell,
                     jnp.where(r2 < ll_j, b_lit,
                               jnp.where(r3 < 2, b_off, b_eml)))
    # tail literals
    rt = o - body_len[:, None]
    tail_src = jnp.clip(last_end[:, None] + rt, 0, N - 1)
    b_tail = jnp.take_along_axis(u8, tail_src, axis=1).astype(jnp.int32)
    in_tail = (~in_body) & (rt < tail_ll[:, None])
    lits = jnp.where(in_body, body,
                     jnp.where(in_tail, b_tail, 0)).astype(jnp.uint8)

    return flags, ntok, lits, lit_len, last_end


# host-side container assembly (Lizard_writeBlock, lizard_compress.c:186)
from lizard_tpu.format.constants import FLAG_UNCOMPRESSED  # noqa: E402


def _minimal_block_gain(comp_len):
    from lizard_tpu.format.constants import minimal_block_gain
    return minimal_block_gain(comp_len)


def _assemble(data, flags, nt, lits, ll):
    out = bytearray()
    body = bytearray()
    body.append(0)                              # header: no huffman streams
    for stream in (b"", b"", b""):              # lens, off16, off24: empty
        body += (0).to_bytes(3, "little")
    f = bytes(flags[:nt])
    body += len(f).to_bytes(3, "little")
    body += f
    lt = bytes(lits[:ll])
    body += len(lt).to_bytes(3, "little")
    body += lt
    if (ll < 16 or nt + ll + 5 * 3 + 1 > len(data)
            or _minimal_block_gain(len(body)) > len(data)):
        out.append(FLAG_UNCOMPRESSED)
        out += len(data).to_bytes(3, "little")
        out += data
    else:
        out += body
    return bytes(out)


def _inner_blocks(blocks, min_offset):
    """Run the TPU pipeline over <=128 KB chunks; yield one assembled
    inner block (header + 5 streams, or uncompressed) per chunk."""
    res = [None] * len(blocks)
    BATCH = 8   # XLA compile time grows steeply with batch (B=32 ~7 min
                # via the axon compile service, B=8 ~12 s); device
                # throughput is already saturated at 8 blocks
    for base in range(0, len(blocks), BATCH):
        part = blocks[base:base + BATCH]
        nb = BATCH           # fixed batch shape: exactly one compile ever
        u8 = np.zeros((nb, N), np.uint8)
        n = np.zeros((nb,), np.int32)
        for k, d in enumerate(part):
            u8[k, :len(d)] = np.frombuffer(d, np.uint8)
            n[k] = len(d)
        flags, ntok, lits, lit_len, _ = _encode_batch(
            jnp.asarray(u8), jnp.asarray(n), min_offset=min_offset)
        flags = np.asarray(flags)
        ntok = np.asarray(ntok)
        lits = np.asarray(lits)
        lit_len = np.asarray(lit_len)
        for k, d in enumerate(part):
            res[base + k] = _assemble(d, flags[k], int(ntok[k]),
                                      lits[k], int(lit_len[k]))
    return res


def encode_blocks_tpu(blocks, level=10, min_offset=8):
    """Compress up to-128 KB blocks with the TPU pipeline. Returns one
    fastLZ4-container stream per block (level byte + one inner block),
    decodable by liblizard and this repo's decoders. min_offset=8
    mirrors LIZARD_FAST_MIN_OFFSET (lizard_compress.c:54) — the
    reference decoder's wildcopy assumes it (measured: offsets < 8
    corrupt liblizard's output, and cost < 0.01% ratio)."""
    for d in blocks:
        if len(d) > N:
            raise ValueError("encode_blocks_tpu: block > 128 KB")
    inner = _inner_blocks(blocks, min_offset)
    return [bytes([level]) + b for b in inner]


def encode_streams_tpu(datas, level=10, min_offset=8):
    """Compress arbitrary-size buffers: each becomes one stream of
    level byte + 128 KB inner blocks (compressed independently — a
    cross-inner-block match is a ratio optimization the reference makes
    that this parallel pipeline deliberately skips). ALL buffers' chunks
    go through the device in shared batches."""
    chunks = []
    spans = []
    for d in datas:
        s0 = len(chunks)
        for i in range(0, len(d), N):
            chunks.append(d[i:i + N])
        if len(d) == 0:
            chunks.append(b"")
        spans.append((s0, len(chunks)))
    inner = _inner_blocks(chunks, min_offset)
    return [bytes([level]) + b"".join(inner[a:b]) for a, b in spans]
