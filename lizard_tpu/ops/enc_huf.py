"""TPU-native Huff0 ENCODER: lane-parallel bitstream packing.

The reference's HUF_compress1X_usingCTable (huf_compress.c:427-470) is a
serial LSB-first bit append per stream. On TPU the whole stream packs in
parallel instead:

  1. per-symbol (code, nbits) via an in-lane table gather,
  2. bit OFFSETS via a lane cumsum (+ cross-tile carry),
  3. each 32-bit output word is a SEGMENT of the offset sequence; codes
     are shifted into place and combined with a segmented OR-scan. A
     code spans at most 11 bits, so only the LAST symbol of a word can
     cross into the next word — its spill rides a one-lane roll and
     participates in the next segment like a normal contribution,
  4. completed words compact to dense lanes by rank (in-tile binary
     search over the cumsum of segment-last flags) and store to the
     stream's word cursor (read-modify-write over two rows).

8 streams ride the sublanes (one per row) with per-stream tables, so a
kernel call packs 8 independent bitstreams; the host provides symbols in
the reference's exact emission order (tail remainder, then reversed) and
finalizes each stream (close bit + byte slice). Output is BIT-IDENTICAL
to ref/huf_encode.py's _huf_encode_1x, hence byte-identical Huff0 blobs
through huf_compress_tpu (header/tree build stays on host: ~100 bytes of
serial logic per 32 KB stream).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lizard_tpu.ops.enc_lanes import _iota0, _iota1, _shl, _shr, _take

MAXBITS = 11                   # HUF_TABLELOG_DEFAULT: codes are <= 11 bits


def _henc_kernel(stiles, otiles, meta, syms_hbm, tab_hbm, out_hbm,
                 syms, tab, out, sems):
    lanes = _iota1()
    sub = _iota0()
    z = jnp.zeros((8, 128), jnp.int32)

    cp0 = pltpu.make_async_copy(syms_hbm, syms, sems.at[0])
    cp0.start()
    cp1 = pltpu.make_async_copy(tab_hbm, tab, sems.at[1])
    cp1.start()
    out[:, :] = jnp.zeros(((otiles + 1) * 8, 128), jnp.int32)
    cp0.wait()
    cp1.wait()

    nlen = z
    for b in range(8):
        nlen = jnp.where(sub == b, meta[b], nlen)

    T0 = tab[pl.ds(0, 8)]
    T1 = tab[pl.ds(8, 8)]

    def body(i, st):
        bitpos, pend_w0, pend_or = st
        gidx = i * 128 + lanes
        alive = gidx < nlen

        sym = syms[pl.ds(i * 8, 8)]
        g = jnp.where(sym >= 128, _take(T1, sym & 127), _take(T0, sym))
        nb = jnp.where(alive, g >> 16, 0)
        val = jnp.where(alive, g & 0xFFFF, 0)

        # inclusive lane cumsum of nb
        incl = nb
        for k in (1, 2, 4, 8, 16, 32, 64):
            incl = incl + jnp.where(lanes >= k,
                                    pltpu.roll(incl, k, 1), 0)
        tile_bits = _take(incl, jnp.full((8, 128), 127, jnp.int32))
        off = bitpos + incl - nb                    # exclusive offsets
        w0 = off >> 5
        sh = off & 31

        lo = _shl(val.astype(jnp.uint32), sh).astype(jnp.int32)
        cross = (sh + nb > 32) & (nb > 0)
        hi = jnp.where(cross,
                       _shr(val.astype(jnp.uint32),
                            (32 - sh) & 31).astype(jnp.int32), 0)
        # spill of lane l lands in lane l+1's segment (its word starts
        # right where the spill goes: words are never skipped; dead
        # lanes still carry the last alive lane's spill into the
        # pending-word segment). A lane-127 spill becomes the next
        # pending word via the carry, so lane 0 receives nothing.
        h2 = jnp.where(lanes >= 1, pltpu.roll(hi, 1, 1), z)
        x = lo | h2

        # segmented inclusive OR-scan by w0 (segments are contiguous)
        sx = x
        for k in (1, 2, 4, 8, 16, 32, 64):
            pw = pltpu.roll(w0, k, 1)
            ps = pltpu.roll(sx, k, 1)
            sx = sx | jnp.where((lanes >= k) & (pw == w0), ps, 0)
        # fold the pending (partially filled) word in
        sx = sx | jnp.where(w0 == pend_w0, pend_or, 0)

        # segment-last flags; lane 127 completes its word iff its code
        # reaches (or crosses) the word boundary — the next symbol then
        # starts in the next word
        comp = (sh + nb >= 32) & (nb > 0)
        nw0 = jnp.where(lanes < 127, pltpu.roll(w0, 127, 1), w0)
        # bitwise select: a bool-valued jnp.where lowers to an i8->i1
        # truncation Mosaic rejects on hardware
        l127 = lanes < 127
        last = ((l127 & (nw0 != w0)) | (~l127 & comp)) & alive

        rank = last.astype(jnp.int32)
        for k in (1, 2, 4, 8, 16, 32, 64):
            rank = rank + jnp.where(lanes >= k,
                                    pltpu.roll(rank, k, 1), 0)
        nwords = _take(rank, jnp.full((8, 128), 127, jnp.int32))

        # dense[j] = sx at the j-th last-lane: binary search over the
        # sorted rank row (first lane with rank == j+1 and last)
        target = lanes + 1
        pos = z
        for step in (64, 32, 16, 8, 4, 2, 1):
            cand = pos + step
            rv = _take(rank, jnp.minimum(cand, 127))
            # move right while rank[cand-?]... classic lower-bound:
            # keep lowest lane with rank >= target
            pos = jnp.where((cand <= 127) & (rv < target), cand, pos)
        # pos = last lane with rank < target; +1 = first with >= target
        L = jnp.minimum(pos + jnp.where(_take(rank, z) >= target, 0, 1),
                        127)
        dense = jnp.where(lanes < nwords, _take(sx, L), 0)

        # ---- store dense words at the stream's word cursor ----------
        wstart = bitpos >> 5                      # == pend_w0 when live
        for b in range(8):
            nw_b = jnp.max(jax.lax.slice(nwords, (b, 0), (b + 1, 1)))
            ws_b = jnp.max(jax.lax.slice(wstart, (b, 0), (b + 1, 1)))

            @pl.when(nw_b > 0)
            def _(b=b, nw_b=nw_b, ws_b=ws_b):
                drow = jax.lax.slice(dense, (b, 0), (b + 1, 128))
                rolled = pltpu.roll(drow, ws_b & 127, 1)
                l1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                rel = ((l1 - (ws_b & 127)) & 127)   # dense index at lane
                r0 = (ws_b >> 7) * 8 + b
                m0 = (l1 >= (ws_b & 127)) & (rel < nw_b)
                row = out[pl.ds(r0, 1)]
                out[pl.ds(r0, 1)] = jnp.where(m0, row | rolled, row)
                r1 = r0 + 8
                m1 = (l1 < (ws_b & 127)) & (rel < nw_b)
                row = out[pl.ds(r1, 1)]
                out[pl.ds(r1, 1)] = jnp.where(m1, row | rolled, row)

        # ---- carries -------------------------------------------------
        # lane 127 reaching/crossing the boundary (comp) closes its
        # word; the new pending word holds only its spill (0 when the
        # code ended exactly at the boundary — hi is strict-cross)
        i127 = jnp.full((8, 128), 127, jnp.int32)
        w127 = _take(w0, i127)
        x127 = _take(sx, i127)
        c127 = _take(comp.astype(jnp.int32), i127)
        h127 = _take(hi, i127)
        live = tile_bits > 0
        pend_w0n = jnp.where(live, w127 + c127, pend_w0)
        pend_orn = jnp.where(live, jnp.where(c127 == 1, h127, x127),
                             pend_or)
        return (bitpos + tile_bits, pend_w0n, pend_orn)

    bitpos, pend_w0, pend_or = jax.lax.fori_loop(
        0, stiles, body, (z, z, z))

    # flush the final partial word + per-stream bit totals (meta row)
    for b in range(8):
        bits_b = jnp.max(jax.lax.slice(bitpos, (b, 0), (b + 1, 1)))
        pw_b = jnp.max(jax.lax.slice(pend_w0, (b, 0), (b + 1, 1)))
        pv_b = jnp.max(jax.lax.slice(pend_or, (b, 0), (b + 1, 1)))

        @pl.when((bits_b & 31) != 0)
        def _(b=b, pw_b=pw_b, pv_b=pv_b):
            r = (pw_b >> 7) * 8 + b
            l1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            row = out[pl.ds(r, 1)]
            out[pl.ds(r, 1)] = jnp.where(l1 == (pw_b & 127),
                                         row | pv_b, row)
    out[pl.ds(otiles * 8, 8)] = bitpos

    cp_out = pltpu.make_async_copy(out, out_hbm, sems.at[2])
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("stiles", "otiles",
                                             "interpret"))
def henc_call(syms, tab, meta, stiles, otiles, interpret=False):
    """syms: (stiles*8, 128) i32 emission-ordered symbols (tile t row b
    = symbols [t*128,+128) of stream b). tab: (16, 128) i32 per-stream
    code tables (entry e of stream b at row (e>>7)*8+b, lane e&127;
    value = nbits<<16 | code). meta: (8,) i32 symbol counts. Returns
    ((otiles+1)*8, 128) i32: packed little-endian words per stream
    (word w of stream b at row (w>>7)*8+b, lane w&127) + one meta tile
    with the per-stream total bit counts."""
    kernel = functools.partial(_henc_kernel, stiles, otiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((stiles * 8, 128), jnp.int32),
            pltpu.VMEM((16, 128), jnp.int32),
            pltpu.VMEM(((otiles + 1) * 8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(((otiles + 1) * 8, 128),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, syms, tab)


# ------------------------------------------------------------------ host

def emission_order(n):
    """The reference's exact symbol order (huf_compress.c:427-470):
    remainder bytes n2+2, n2+1, n2 first, then n2-1 .. 0."""
    n2 = n & ~3
    head = [j for j in (n2 + 2, n2 + 1, n2) if j < n]
    return np.array(head + list(range(n2 - 1, -1, -1)), np.int64)


def pack_streams(chunks, tables):
    """chunks: <= 8 byte strings (emission already applied by caller or
    raw? raw — this packs RAW chunks in emission order). tables: list of
    (sym_val, sym_nb_bits) per chunk. Returns (syms, tab, meta, stiles,
    otiles)."""
    maxn = max((len(c) for c in chunks), default=1)
    stiles = max((maxn + 127) // 128, 1)
    syms = np.zeros((8, stiles * 128), np.int32)
    tab = np.zeros((8, 256), np.int32)
    meta = np.zeros((8,), np.int32)
    for b, c in enumerate(chunks):
        n = len(c)
        meta[b] = n
        if n:
            u8 = np.frombuffer(c, np.uint8)
            syms[b, :n] = u8[emission_order(n)]
        val, nb = tables[b]
        tab[b, :len(val)] = (np.asarray(nb, np.int32) << 16) | \
            np.asarray(val, np.int32)
    otiles = max((stiles * 128 * MAXBITS + 31) // 32 + 1, 1)
    otiles = (otiles + 127) // 128
    syms_t = (syms.reshape(8, stiles, 128).transpose(1, 0, 2)
              .reshape(stiles * 8, 128))
    tab_t = tab.reshape(8, 2, 128).transpose(1, 0, 2).reshape(16, 128)
    return syms_t, tab_t, meta, stiles, otiles


def unpack_streams(out, otiles):
    """Kernel output -> per-stream bytes (close bit appended, exact
    BitWriter.close() semantics)."""
    out = np.asarray(out)
    bits = out[otiles * 8: otiles * 8 + 8, 0]
    words = (out[:otiles * 8].reshape(otiles, 8, 128)
             .transpose(1, 0, 2).reshape(8, otiles * 128))
    res = []
    for b in range(8):
        nb = int(bits[b])
        raw = words[b].astype("<u4").tobytes()
        nbytes = (nb + 1 + 7) // 8
        buf = bytearray(raw[:nbytes])
        buf[nb >> 3] |= 1 << (nb & 7)            # end mark
        res.append(bytes(buf))
    return res


def huf_encode_streams_tpu(chunks, tables, interpret=None):
    """Encode up to 8 (chunk, table) pairs on the TPU; returns the
    per-chunk Huff0 bitstream bytes (== _huf_encode_1x output)."""
    import jax as _jax
    if interpret is None:
        interpret = _jax.default_backend() == "cpu"
    syms, tab, meta, stiles, otiles = pack_streams(chunks, tables)
    out = henc_call(jnp.asarray(syms), jnp.asarray(tab),
                    jnp.asarray(meta), stiles, otiles,
                    interpret=interpret)
    return unpack_streams(out, otiles)[:len(chunks)]


def huf_compress_tpu(src: bytes, interpret=None):
    """HUF_compress with the 4-stream bit-packing on TPU: byte-identical
    to ref/huf_encode.huf_compress (header/tree build on host)."""
    from lizard_tpu.ref.huf_encode import (HUF_TABLELOG_DEFAULT,
                                           _fse_count,
                                           fse_optimal_table_log,
                                           huf_build_ctable,
                                           huf_write_ctable)
    n = len(src)
    if n == 0:
        return None
    if n > 128 * 1024:
        raise ValueError("HUF block too large")
    count, max_sym, largest = _fse_count(src, 255)
    if largest == n:
        return src[:1]
    if largest <= (n >> 7) + 1:
        return None
    huff_log = fse_optimal_table_log(HUF_TABLELOG_DEFAULT, n, max_sym,
                                     minus=1)
    sym_nb_bits, sym_val, huff_log = huf_build_ctable(count, max_sym,
                                                      huff_log)
    header = huf_write_ctable(sym_nb_bits, max_sym, huff_log)
    if len(header) + 12 >= n or n < 12:
        return None
    seg = (n + 3) // 4
    chunks = [src[i * seg:(i + 1) * seg] for i in range(3)] + \
        [src[3 * seg:]]
    parts = huf_encode_streams_tpu(
        chunks, [(sym_val, sym_nb_bits)] * 4, interpret=interpret)
    for c in parts:
        if len(c) == 0 or len(c) > 0xFFFF:
            return None
    jump = b"".join(len(parts[i]).to_bytes(2, "little")
                    for i in range(3))
    out = header + jump + b"".join(parts)
    if len(out) >= n - 1:
        return None
    return out
