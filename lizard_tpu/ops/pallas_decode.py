"""Fused Pallas TPU block decoders (fastLZ4 and LIZv1 codewords).

One pallas_call decodes a whole batch of 128 KB inner blocks (grid over
blocks, sequential on-core). Per block:

- literal stream DMA'd into VMEM (bytes unpacked to one-per-i32 lane)
- token (flags) stream DMA'd chunk-wise into SMEM for cheap scalar reads
- a rolling output window lives in VMEM scratch: 512 rows (64 KB) of halo —
  exactly the fastLZ4 windowLog=16 reach — plus 1024 rows (128 KB) for the
  current block; the halo is the previous block's tail, carried across grid
  steps (scratch persists per-core), so inner-block window sharing costs no
  HBM read-back
- literal runs and match copies are misaligned VECTOR copies: 128-byte rows
  moved with dynamic lane rotations + masked read-modify-write, the TPU
  equivalent of Lizard_wildCopy16 (lib/lizard_common.h:368-377); overlapping
  matches (offset < run) use the standard doubling trick so every copy step
  is non-overlapping
- the decoded block is DMA'd back to HBM as [1024, 128] i32 rows (byte per
  lane); the caller packs to u8 with one elementwise XLA op

The LIZv1 variant adds rep-offset state, the two separated offset streams,
and a far-match path: offsets reach up to 16 MB back (windowLog 22/24), so
sources beyond the VMEM window are DMA'd from the already-written HBM output
in chunks (sources advance toward the write position, so at most one
far->near transition occurs per match).

Assumes well-formed input (the format guarantees: offset >= 8, last 16
bytes literal, blocks decode to exactly 128 KB except the last of a stream).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_BLK = 1024          # 128 KB block = 1024 rows of 128 bytes
ROWS_WIN = 512           # 64 KB halo (fastLZ4 windowLog = 16)
ROWS_OUT = ROWS_WIN + ROWS_BLK + 1  # +1 pad row for 2-row funnel reads
LIT_ROWS = 1280          # literal VMEM rows (128KB stream + DMA slack)
FLAG_ROWS = 288          # token stream VMEM rows (max ~33K tokens/block)
DMA_ROWS = 256           # stream DMA granularity (rows; multiple of the
                         # (8,128) i32 tile so HBM slices stay tile-aligned)

MINMATCH = 4


def _lanes():
    return jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)


def _extract(ref, byte_pos):
    """Scalar byte at stream position byte_pos from an unpacked [rows,128]
    i32 ref: dynamic-row load + dynamic lane roll + lane-0 reduce."""
    row = byte_pos >> 7
    lane = byte_pos & 127
    r = ref[pl.ds(row, 1), :]
    rolled = pltpu.roll(r, -lane, 1)
    return jnp.sum(rolled[:, 0:1]).astype(jnp.int32)


def _window(ref, byte_pos):
    """(1,128) vector v with v[i] = byte[byte_pos+i]: 2-row funnel."""
    lanes = _lanes()
    row = byte_pos >> 7
    lane = byte_pos & 127
    s2 = ref[pl.ds(row, 2), :]
    a = pltpu.roll(s2[0:1], -lane, 1)
    b = pltpu.roll(s2[1:2], -lane, 1)
    return jnp.where(lanes < 128 - lane, a, b)


def _wlane(v, k):
    """Scalar at static lane k of a (1,128) window."""
    return jnp.sum(v[:, k:k + 1]).astype(jnp.int32)


def _ext_from_window(v, base_lane):
    """Length extension (<254 / 254+LE16 / 255+LE24) read from window lanes
    starting at static base_lane. Returns (value, nbytes)."""
    b0 = _wlane(v, base_lane)
    b1 = _wlane(v, base_lane + 1)
    b2 = _wlane(v, base_lane + 2)
    b3 = _wlane(v, base_lane + 3)
    val = jnp.where(b0 < 254, b0,
                    jnp.where(b0 == 254, b1 | (b2 << 8),
                              b1 | (b2 << 8) | (b3 << 16)))
    n = jnp.where(b0 < 254, 1, jnp.where(b0 == 254, 3, 4))
    return val, n


def _read_ext(ref, pos):
    """Length extension (<254 / 254+LE16 / 255+LE24) at byte pos."""
    b0 = _extract(ref, pos)
    b1 = _extract(ref, pos + 1)
    b2 = _extract(ref, pos + 2)
    b3 = _extract(ref, pos + 3)
    val = jnp.where(b0 < 254, b0,
                    jnp.where(b0 == 254, b1 | (b2 << 8),
                              b1 | (b2 << 8) | (b3 << 16)))
    n = jnp.where(b0 < 254, 1, jnp.where(b0 == 254, 3, 4))
    return val, n


def _copy_run(dst_ref, src_ref, dst_off, src_off, n):
    """Byte-granular copy of n (>0) bytes, dst-row aligned loop with funnel
    reads (2 src rows -> rolled vector) and masked RMW writes. src and dst
    regions must not overlap (callers guarantee; overlapping matches are
    decomposed by doubling)."""
    lanes = _lanes()
    delta = src_off - dst_off

    def body(state):
        done, _ = state
        dpos = dst_off + done
        drow = dpos >> 7
        dlane = dpos & 127
        # how many bytes into this dst row (cap at row end and n)
        take = jnp.minimum(128 - dlane, n - done)
        spos = dpos + delta
        srow = spos >> 7
        slane = spos & 127
        s2 = src_ref[pl.ds(srow, 2), :]
        a = pltpu.roll(s2[0:1], -slane, 1)
        b = pltpu.roll(s2[1:2], -slane, 1)
        v = jnp.where(lanes < 128 - slane, a, b)   # v[i] = src byte spos+i
        # place at dlane: rotate right by dlane
        w = pltpu.roll(v, dlane, 1)
        mask = (lanes >= dlane) & (lanes < dlane + take)
        old = dst_ref[pl.ds(drow, 1), :]
        dst_ref[pl.ds(drow, 1), :] = jnp.where(mask, w, old)
        return done + take, 0

    jax.lax.while_loop(lambda s: s[0] < n, body, (jnp.int32(0), jnp.int32(0)))


def _copy_match(out_ref, dst_off, off, n):
    """LZ77 match copy within the output window: handles overlap (off < n)
    by doubling the copied region (every _copy_run is non-overlapping)."""
    def cond(s):
        return s[0] < n

    def body(s):
        done, avail = s
        take = jnp.minimum(avail, n - done)
        # read at distance `avail` (a power-of-two multiple of `off`, so the
        # replicated pattern is preserved and src/dst never overlap)
        _copy_run(out_ref, out_ref, dst_off + done, dst_off + done - avail, take)
        return done + take, avail + take

    jax.lax.while_loop(cond, body, (jnp.int32(0), off))


def _dma_rows(src_hbm, dst_vmem, row0, nrows, sem, max_rows):
    """Chunked row DMA; row0 must be a multiple of 8 ((8,128) i32 tiling)."""
    def dma_body(i, _):
        @pl.when(i * DMA_ROWS < nrows)
        def _():
            cp = pltpu.make_async_copy(
                src_hbm.at[pl.ds(row0 + i * DMA_ROWS, DMA_ROWS)],
                dst_vmem.at[pl.ds(i * DMA_ROWS, DMA_ROWS)],
                sem)
            cp.start()
            cp.wait()
        return 0
    jax.lax.fori_loop(0, max_rows // DMA_ROWS, dma_body, 0)


def _lz4_block_kernel(flags_off_r, n_tokens_r, lit_off_r, lit_len_r,
                      flags_hbm, lit_hbm, out_hbm,
                      outw, litv, flagv, sems):
    b = pl.program_id(0)
    n_tok = n_tokens_r[b]
    lit_off = lit_off_r[b]
    lit_len = lit_len_r[b]
    f_off = flags_off_r[b]

    # 1. roll the window: previous block's tail becomes the halo
    outw[0:ROWS_WIN, :] = outw[ROWS_BLK:ROWS_BLK + ROWS_WIN, :]

    # 2. DMA this block's streams into VMEM (8-row-aligned supersets)
    lrow0 = (lit_off >> 7) & ~7
    lnrows = ((lit_off + lit_len + 127) >> 7) - lrow0
    _dma_rows(lit_hbm, litv, lrow0, lnrows, sems.at[0], LIT_ROWS)
    lit_base = lrow0 << 7  # litv byte k == stream byte lit_base+k

    frow0 = (f_off >> 7) & ~7
    fnrows = ((f_off + n_tok + 127) >> 7) - frow0
    _dma_rows(flags_hbm, flagv, frow0, fnrows, sems.at[1], FLAG_ROWS)
    flag_base = frow0 << 7

    # 3. token loop
    OUT_BASE = ROWS_WIN * 128

    def tok_cond(s):
        return s[0] < n_tok

    def tok_body(s):
        tok_i, lit_p, out_p, chunk = s
        token = _extract(flagv, f_off + tok_i - flag_base)

        # speculative straight-line decode: scalar branches stall the
        # pipeline far more than the extra vector work costs
        ll0 = token & 15
        ext, extn = _read_ext(litv, lit_p - lit_base)
        has_ll_ext = ll0 == 15
        ll = jnp.where(has_ll_ext, ext + 15, ll0)
        lit_p = lit_p + jnp.where(has_ll_ext, extn, 0)

        @pl.when(ll > 0)
        def _():
            _copy_run(outw, litv, OUT_BASE + out_p, lit_p - lit_base, ll)
        out_p = out_p + ll
        lit_p = lit_p + ll

        # (measured: independent single-row extracts beat 2-row funnel
        # windows here -- shorter scalar->vector dependency chains)
        b0 = _extract(litv, lit_p - lit_base)
        b1 = _extract(litv, lit_p + 1 - lit_base)
        off = b0 | (b1 << 8)
        lit_p = lit_p + 2

        ml0 = token >> 4
        ext2, extn2 = _read_ext(litv, lit_p - lit_base)
        has_ml_ext = ml0 == 15
        ml = jnp.where(has_ml_ext, ext2 + 15, ml0) + MINMATCH
        lit_p = lit_p + jnp.where(has_ml_ext, extn2, 0)

        _copy_match(outw, OUT_BASE + out_p, off, ml)
        out_p = out_p + ml

        return tok_i + 1, lit_p, out_p, chunk

    tok_i, lit_p, out_p, _ = jax.lax.while_loop(
        tok_cond, tok_body, (jnp.int32(0), lit_off, jnp.int32(0), jnp.int32(0)))

    # trailing literals
    t_ll = lit_off + lit_len - lit_p
    @pl.when(t_ll > 0)
    def _():
        _copy_run(outw, litv, OUT_BASE + out_p, lit_p - lit_base, t_ll)

    # 4. write back the block rows
    cp = pltpu.make_async_copy(
        outw.at[pl.ds(ROWS_WIN, ROWS_BLK)],
        out_hbm.at[pl.ds(b * ROWS_BLK, ROWS_BLK)],
        sems.at[2])
    cp.start()
    cp.wait()


LIZ_FLAG_ROWS = 1040     # LIZv1 tokens can be 1/byte (rep ml=1): up to 128K
OFF_ROWS = 1040          # off16/off24 streams are < 128 KB by construction
STAGE_ROWS = 48          # far-match DMA staging (4 KB chunks + align slack)
FAR_CHUNK = 4096


def _liz_match_copy(out_hbm, outw, staging, sem, b, out_p, off, ml):
    """LIZv1 match copy: offsets reach up to 16 MB back (windowLog 22/24).
    Sources within the VMEM window (current block + 64 KB halo) copy
    locally; farther sources are DMA'd from the already-written HBM output
    in 4 KB chunks. Sources advance toward the write position, so at most
    one far->near transition occurs."""
    OUT_BASE = ROWS_WIN * 128

    def cond(s):
        return s[0] < ml

    def body(s):
        done, _ = s
        dst_local = OUT_BASE + out_p + done
        src_local = dst_local - off
        is_near = src_local >= 0

        @pl.when(is_near)
        def _():
            # in-window: overlap-safe doubling copy for the whole remainder
            _copy_match(outw, dst_local, off, ml - done)

        @pl.when(jnp.logical_not(is_near))
        def _():
            # far: source strictly below the halo; chunk stays in HBM region
            src_global = b * (ROWS_BLK * 128) + out_p + done - off
            chunk = jnp.minimum(jnp.minimum(ml - done, FAR_CHUNK), -src_local)
            srow0 = (src_global >> 7) & ~7
            cp = pltpu.make_async_copy(
                out_hbm.at[pl.ds(srow0, STAGE_ROWS - 8)],
                staging.at[pl.ds(0, STAGE_ROWS - 8)],
                sem)
            cp.start()
            cp.wait()
            _copy_run(outw, staging, dst_local, src_global - (srow0 << 7), chunk)

        chunk = jnp.where(is_near, ml - done,
                          jnp.minimum(jnp.minimum(ml - done, FAR_CHUNK),
                                      -src_local))
        return done + chunk, 0

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))


def _liz_block_kernel(flags_off_r, n_tokens_r, lit_off_r, lit_len_r,
                      o16_off_r, o16_len_r, o24_off_r, o24_len_r,
                      flags_hbm, lit_hbm, o16_hbm, o24_hbm, out_hbm,
                      outw, litv, flagv, o16v, o24v, staging, sems):
    """LIZv1 codewords (lib/lizard_decompress_liz.h): 4 token classes,
    rep-offsets (reset per block), separated 16/24-bit offset streams."""
    b = pl.program_id(0)
    n_tok = n_tokens_r[b]
    lit_off = lit_off_r[b]
    lit_len = lit_len_r[b]
    f_off = flags_off_r[b]
    s16_off = o16_off_r[b]
    s16_len = o16_len_r[b]
    s24_off = o24_off_r[b]
    s24_len = o24_len_r[b]

    outw[0:ROWS_WIN, :] = outw[ROWS_BLK:ROWS_BLK + ROWS_WIN, :]

    lrow0 = (lit_off >> 7) & ~7
    _dma_rows(lit_hbm, litv, lrow0, ((lit_off + lit_len + 127) >> 7) - lrow0,
              sems.at[0], LIT_ROWS)
    lit_base = lrow0 << 7

    frow0 = (f_off >> 7) & ~7
    _dma_rows(flags_hbm, flagv, frow0, ((f_off + n_tok + 127) >> 7) - frow0,
              sems.at[1], LIZ_FLAG_ROWS)
    flag_base = frow0 << 7

    s16row0 = (s16_off >> 7) & ~7
    _dma_rows(o16_hbm, o16v, s16row0,
              ((s16_off + s16_len + 127) >> 7) - s16row0, sems.at[0], OFF_ROWS)
    s16_base = s16row0 << 7
    s24row0 = (s24_off >> 7) & ~7
    _dma_rows(o24_hbm, o24v, s24row0,
              ((s24_off + s24_len + 127) >> 7) - s24row0, sems.at[1], OFF_ROWS)
    s24_base = s24row0 << 7

    OUT_BASE = ROWS_WIN * 128

    def tok_cond(s):
        return s[0] < n_tok

    def tok_body(s):
        tok_i, lit_p, out_p, p16, p24, last_off = s
        token = _extract(flagv, f_off + tok_i - flag_base)

        is_short = token >= 32
        is_rep = token >= 128
        is_long31 = token == 31

        # --- short-token literal run ---
        ll0 = token & 7
        ext, extn = _read_ext(litv, lit_p - lit_base)
        has_ll_ext = is_short & (ll0 == 7)
        ll = jnp.where(is_short, jnp.where(has_ll_ext, ext + 7, ll0), 0)
        lit_p = lit_p + jnp.where(has_ll_ext, extn, 0)

        @pl.when(ll > 0)
        def _():
            _copy_run(outw, litv, OUT_BASE + out_p, lit_p - lit_base, ll)
        out_p = out_p + ll
        lit_p = lit_p + ll

        # --- offset ---
        n16a = _extract(o16v, p16 - s16_base)
        n16b = _extract(o16v, p16 + 1 - s16_base)
        new16 = n16a | (n16b << 8)
        use16 = is_short & jnp.logical_not(is_rep)
        p16 = p16 + jnp.where(use16, 2, 0)

        n24a = _extract(o24v, p24 - s24_base)
        n24b = _extract(o24v, p24 + 1 - s24_base)
        n24c = _extract(o24v, p24 + 2 - s24_base)
        new24 = n24a | (n24b << 8) | (n24c << 16)
        use24 = jnp.logical_not(is_short)
        p24 = p24 + jnp.where(use24, 3, 0)

        # --- match length ---
        mls = (token >> 3) & 15
        ext2, extn2 = _read_ext(litv, lit_p - lit_base)
        has_ml_ext = is_short & (mls == 15)
        # token 31: length ext read BEFORE the 24-bit offset is consumed
        is_ext31 = jnp.logical_not(is_short) & is_long31
        ml = jnp.where(is_short,
                       jnp.where(has_ml_ext, ext2 + 15, mls),
                       jnp.where(is_long31, ext2 + 31 + 16, token + 16))
        lit_p = lit_p + jnp.where(has_ml_ext | is_ext31, extn2, 0)

        last_off = jnp.where(use16, new16, jnp.where(use24, new24, last_off))

        @pl.when((ml > 0) & (last_off > 0))
        def _():
            _liz_match_copy(out_hbm, outw, staging, sems.at[2], b, out_p,
                            last_off, ml)
        out_p = out_p + ml

        return tok_i + 1, lit_p, out_p, p16, p24, last_off

    _, lit_p, out_p, _, _, _ = jax.lax.while_loop(
        tok_cond, tok_body,
        (jnp.int32(0), lit_off, jnp.int32(0), s16_off, s24_off, jnp.int32(0)))

    t_ll = lit_off + lit_len - lit_p
    @pl.when(t_ll > 0)
    def _():
        _copy_run(outw, litv, OUT_BASE + out_p, lit_p - lit_base, t_ll)

    cp = pltpu.make_async_copy(
        outw.at[pl.ds(ROWS_WIN, ROWS_BLK)],
        out_hbm.at[pl.ds(b * ROWS_BLK, ROWS_BLK)],
        sems.at[2])
    cp.start()
    cp.wait()


@functools.partial(jax.jit, static_argnames=("n_blocks", "interpret"))
def _pallas_decode_liz(flag_rows, lit_rows, o16_rows, o24_rows,
                       flags_off, n_tokens, lit_off, lit_len,
                       o16_off, o16_len, o24_off, o24_len,
                       n_blocks, interpret=False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((ROWS_OUT, 128), jnp.int32),
            pltpu.VMEM((LIT_ROWS, 128), jnp.int32),
            pltpu.VMEM((LIZ_FLAG_ROWS, 128), jnp.int32),
            pltpu.VMEM((OFF_ROWS, 128), jnp.int32),
            pltpu.VMEM((OFF_ROWS, 128), jnp.int32),
            pltpu.VMEM((STAGE_ROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        _liz_block_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * ROWS_BLK, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(flags_off, n_tokens, lit_off, lit_len, o16_off, o16_len,
      o24_off, o24_len, flag_rows, lit_rows, o16_rows, o24_rows)
    return out


@functools.partial(jax.jit, static_argnames=("n_blocks", "interpret"))
def _pallas_decode_lz4(flags_i32, lit_rows, flags_off, n_tokens,
                       lit_off, lit_len, n_blocks, interpret=False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((ROWS_OUT, 128), jnp.int32),
            pltpu.VMEM((LIT_ROWS, 128), jnp.int32),
            pltpu.VMEM((FLAG_ROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        _lz4_block_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * ROWS_BLK, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(flags_off, n_tokens, lit_off, lit_len, flags_i32, lit_rows)
    return out


def _to_rows(a, pad_rows):
    n = len(a)
    rows = (n + 127) // 128 + pad_rows
    buf = np.zeros(rows * 128, np.int32)
    buf[:n] = a
    return buf.reshape(rows, 128)


def decode_batch_pallas(batch, interpret=False):
    """Decode a BlockBatch with the fused Pallas kernel (both codeword
    families). Returns a padded [n_blocks*1024, 128] i32 array (one byte per
    lane). Blocks must decode to <= 128 KB each (always true); only the last
    block of a stream may be short, so padded == compact for single streams."""
    from lizard_tpu.format.levels import Codewords

    if batch.codewords == Codewords.LZ4:
        return _pallas_decode_lz4(
            jnp.asarray(_to_rows(batch.flags, FLAG_ROWS)),
            jnp.asarray(_to_rows(batch.literals, LIT_ROWS)),
            jnp.asarray(batch.flags_off), jnp.asarray(batch.flags_len),
            jnp.asarray(batch.lit_off), jnp.asarray(batch.lit_len),
            n_blocks=int(batch.n_blocks), interpret=interpret)
    return _pallas_decode_liz(
        jnp.asarray(_to_rows(batch.flags, LIZ_FLAG_ROWS)),
        jnp.asarray(_to_rows(batch.literals, LIT_ROWS)),
        jnp.asarray(_to_rows(batch.off16, OFF_ROWS)),
        jnp.asarray(_to_rows(batch.off24, OFF_ROWS)),
        jnp.asarray(batch.flags_off), jnp.asarray(batch.flags_len),
        jnp.asarray(batch.lit_off), jnp.asarray(batch.lit_len),
        jnp.asarray(batch.off16_off), jnp.asarray(batch.off16_len),
        jnp.asarray(batch.off24_off), jnp.asarray(batch.off24_len),
        n_blocks=int(batch.n_blocks), interpret=interpret)


def decompress_pallas(src: bytes, max_out: int, interpret=False) -> bytes:
    """One-shot decode via the fused kernel (single stream, any family)."""
    from lizard_tpu.ops.split import finalize, new_accumulator, split_stream
    acc = new_accumulator()
    family = split_stream(src, acc, 0)
    batch = finalize(acc, family)
    if batch.n_blocks == 0:
        return b""
    out = decode_batch_pallas(batch, interpret=interpret)
    flat = np.asarray(out, dtype=np.int32).astype(np.uint8).reshape(-1)
    # blocks are full 128 KB except the last: total = max_out
    return flat[:max_out].tobytes() if max_out <= flat.size else flat.tobytes()
