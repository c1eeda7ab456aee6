"""TPU-native batched Lizard block decode (JAX/XLA).

Three phases, all batched struct-of-arrays over inner blocks — the design
exploits the format's latent parallelism (SURVEY.md §2.5) instead of
translating the reference's byte-pointer loop (lib/lizard_decompress_*.h):

A. token parse — the only sequential dependency is the literal-stream
   cursor; run one lax.scan step per token, vectorized across all blocks in
   the batch (each step is pure VPU work: gathers + selects).
B. expansion — per-output-byte source pointers via scatter + cumsum
   segment-fill over the compact output domain: literals point into the flat
   literal array (encoded negative), match bytes point `offset` back.
C. resolution — match chains collapse by pointer doubling (log2(N) gather
   rounds); final gather fetches literal bytes.

Decompressed bytes are produced in one compact array covering all blocks of
all streams in the batch, so inner-block window references (blocks of one
stream share the LZ77 window) resolve naturally.

This path assumes well-formed input (it never reads out of bounds — indices
are clipped — but does not diagnose corruption); the scalar reference
decoder and the frame checksum provide validation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lizard_tpu.format.levels import Codewords
from lizard_tpu.ops.split import BlockBatch

MINMATCH = 4
GUARD = 8  # flat arrays are padded so 4-byte speculative reads stay in range


def _le16(a, b):
    return a.astype(jnp.int32) | (b.astype(jnp.int32) << 8)


def _read_ext(lit, pos):
    """Speculative variable-length length-extension read at `pos`:
    returns (value+0, consumed_bytes) for the <254 / 254+LE16 / 255+LE24
    scheme (doc/lizard_Block_format.md:91-96)."""
    b0 = jnp.take(lit, pos, mode="clip").astype(jnp.int32)
    b1 = jnp.take(lit, pos + 1, mode="clip").astype(jnp.int32)
    b2 = jnp.take(lit, pos + 2, mode="clip").astype(jnp.int32)
    b3 = jnp.take(lit, pos + 3, mode="clip").astype(jnp.int32)
    val16 = b1 | (b2 << 8)
    val24 = b1 | (b2 << 8) | (b3 << 16)
    value = jnp.where(b0 < 254, b0, jnp.where(b0 == 254, val16, val24))
    nbytes = jnp.where(b0 < 254, 1, jnp.where(b0 == 254, 3, 4))
    return value, nbytes


def token_parse_lz4(flags, lit, flags_off, n_tokens, lit_off, lit_len, max_steps):
    """Phase A for fastLZ4 codewords (semantics of
    lib/lizard_decompress_lz4.h:41-153). Returns per-token
    (ll, ml, off, lit_start) arrays of shape [B, max_steps+1]; the final
    step per block is the trailing-literals pseudo-token."""
    B = flags_off.shape[0]

    def step(state, _):
        tok_i, lit_pos = state
        active = tok_i < n_tokens
        trailing = tok_i == n_tokens

        token = jnp.take(flags, flags_off + tok_i, mode="clip").astype(jnp.int32)
        token = jnp.where(active, token, 0)

        ll0 = token & 15
        ext_val, ext_n = _read_ext(lit, lit_pos)
        has_ll_ext = active & (ll0 == 15)
        ll = jnp.where(has_ll_ext, ext_val + 15, ll0)
        lit_pos = lit_pos + jnp.where(has_ll_ext, ext_n, 0)

        lit_start = lit_pos
        lit_pos = lit_pos + jnp.where(active, ll, 0)

        off = _le16(jnp.take(lit, lit_pos, mode="clip"),
                    jnp.take(lit, lit_pos + 1, mode="clip"))
        lit_pos = lit_pos + jnp.where(active, 2, 0)

        ml0 = token >> 4
        ext_val2, ext_n2 = _read_ext(lit, lit_pos)
        has_ml_ext = active & (ml0 == 15)
        ml = jnp.where(has_ml_ext, ext_val2 + 15, ml0) + MINMATCH
        lit_pos = lit_pos + jnp.where(has_ml_ext, ext_n2, 0)

        # trailing literals: everything left in this block's literal stream
        t_ll = lit_off + lit_len - lit_pos
        ll = jnp.where(trailing, t_ll, jnp.where(active, ll, 0))
        ml = jnp.where(active, ml, 0)
        off = jnp.where(active, off, 0)
        lit_start = jnp.where(trailing | active, lit_start, 0)
        lit_pos = lit_pos + jnp.where(trailing, t_ll, 0)

        return (tok_i + 1, lit_pos), (ll, ml, off, lit_start)

    init = (jnp.zeros(B, jnp.int32), lit_off.astype(jnp.int32))
    _, (ll, ml, off, lit_start) = jax.lax.scan(step, init, None,
                                               length=max_steps + 1)
    # [T+1, B] -> [B, T+1]
    return ll.T, ml.T, off.T, lit_start.T


def token_parse_liz(flags, lit, off16, off24, flags_off, n_tokens,
                    lit_off, lit_len, off16_off, off24_off, max_steps):
    """Phase A for LIZv1 codewords (lib/lizard_decompress_liz.h:50-209):
    4 token classes, rep-offsets, separated offset streams."""
    B = flags_off.shape[0]

    def step(state, _):
        tok_i, lit_pos, o16_pos, o24_pos, last_off = state
        active = tok_i < n_tokens
        trailing = tok_i == n_tokens

        token = jnp.take(flags, flags_off + tok_i, mode="clip").astype(jnp.int32)
        token = jnp.where(active, token, 255)  # inactive: harmless short token

        is_short = token >= 32          # [F_MMMM_LLL]
        is_rep = is_short & (token >= 128)
        is_long31 = token == 31         # 24-bit offset, ext ML
        is_long = (~is_short) & (~is_long31)  # tokens 0..30

        # --- short-token literal length ---
        ll0 = token & 7
        ext_val, ext_n = _read_ext(lit, lit_pos)
        has_ll_ext = active & is_short & (ll0 == 7)
        ll = jnp.where(has_ll_ext, ext_val + 7, ll0)
        ll = jnp.where(active & is_short, ll, 0)
        lit_pos = lit_pos + jnp.where(has_ll_ext, ext_n, 0)

        lit_start = lit_pos
        lit_pos = lit_pos + ll

        # --- offsets ---
        new16 = _le16(jnp.take(off16, o16_pos, mode="clip"),
                      jnp.take(off16, o16_pos + 1, mode="clip"))
        use16 = active & is_short & (~is_rep)
        o16_pos = o16_pos + jnp.where(use16, 2, 0)

        # --- match length ---
        mls = (token >> 3) & 15
        ext_val2, ext_n2 = _read_ext(lit, lit_pos)
        has_ml_ext = active & is_short & (mls == 15)
        ml_short = jnp.where(has_ml_ext, ext_val2 + 15, mls)
        # token 31: length extension comes BEFORE the 24-bit offset read
        ext_val3, ext_n3 = _read_ext(lit, lit_pos)
        ml31 = ext_val3 + 31 + 16
        lit_pos = lit_pos + jnp.where(has_ml_ext, ext_n2,
                                      jnp.where(active & is_long31, ext_n3, 0))

        new24 = (jnp.take(off24, o24_pos, mode="clip").astype(jnp.int32)
                 | (jnp.take(off24, o24_pos + 1, mode="clip").astype(jnp.int32) << 8)
                 | (jnp.take(off24, o24_pos + 2, mode="clip").astype(jnp.int32) << 16))
        use24 = active & (is_long | is_long31)
        o24_pos = o24_pos + jnp.where(use24, 3, 0)

        last_off = jnp.where(use16, new16, jnp.where(use24, new24, last_off))

        ml = jnp.where(is_short, ml_short,
                       jnp.where(is_long31, ml31, token + 16))
        ml = jnp.where(active, ml, 0)
        off = jnp.where(active, last_off, 0)

        # trailing literals
        t_ll = lit_off + lit_len - lit_pos
        ll = jnp.where(trailing, t_ll, ll)
        lit_start = jnp.where(trailing | active, lit_start, 0)
        lit_pos = lit_pos + jnp.where(trailing, t_ll, 0)

        # last_off resets at inner-block boundaries; blocks are batch rows
        # here so each row is one block: no reset needed mid-scan.
        return (tok_i + 1, lit_pos, o16_pos, o24_pos, last_off), (ll, ml, off, lit_start)

    init = (jnp.zeros(B, jnp.int32), lit_off.astype(jnp.int32),
            off16_off.astype(jnp.int32), off24_off.astype(jnp.int32),
            jnp.zeros(B, jnp.int32))
    _, (ll, ml, off, lit_start) = jax.lax.scan(step, init, None,
                                               length=max_steps + 1)
    return ll.T, ml.T, off.T, lit_start.T


def resolve_output(ll, ml, off, lit_start, n_tokens, lit_flat, total_out,
                   max_tokens_total):
    """Phases B+C: per-token arrays [B, T+1] -> decompressed bytes
    [total_out] (compact, blocks concatenated in batch order)."""
    B, T1 = ll.shape
    tok_valid = (jnp.arange(T1)[None, :] <= n_tokens[:, None])

    seq_len = jnp.where(tok_valid, ll + ml, 0)
    # block output start = exclusive cumsum of block output lengths
    blk_len = jnp.sum(seq_len, axis=1)
    blk_start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                 jnp.cumsum(blk_len)[:-1].astype(jnp.int32)])
    # token output start, global compact coordinates
    tok_start = (blk_start[:, None]
                 + jnp.cumsum(seq_len, axis=1) - seq_len)

    # flatten valid tokens to a dense token list (valid tokens are a prefix
    # of each row: rank = tokens-before-this-block + t)
    tok_rank_base = jnp.concatenate([
        jnp.zeros(1, jnp.int32),
        jnp.cumsum(n_tokens + 1)[:-1].astype(jnp.int32)])
    rank = tok_rank_base[:, None] + jnp.arange(T1)[None, :]
    rank = jnp.where(tok_valid & (seq_len > 0), rank, max_tokens_total)  # drop

    def flat_scatter(x):
        out = jnp.zeros(max_tokens_total + 1, jnp.int32)
        return out.at[rank.reshape(-1)].set(x.reshape(-1).astype(jnp.int32),
                                            mode="drop")

    f_start = flat_scatter(tok_start)
    f_ll = flat_scatter(ll)
    f_off = flat_scatter(off)
    f_lit = flat_scatter(lit_start)

    # segment id per output byte: scatter 1s at token starts, cumsum
    marker = jnp.zeros(total_out, jnp.int32)
    starts = jnp.where(rank < max_tokens_total, tok_start, total_out)
    marker = marker.at[starts.reshape(-1)].add(1, mode="drop")
    seg = jnp.cumsum(marker) - 1
    seg = jnp.clip(seg, 0, max_tokens_total)

    pos = jnp.arange(total_out, dtype=jnp.int32)
    s_start = jnp.take(f_start, seg)
    s_ll = jnp.take(f_ll, seg)
    s_off = jnp.take(f_off, seg)
    s_lit = jnp.take(f_lit, seg)
    in_tok = pos - s_start
    is_lit = in_tok < s_ll
    src = jnp.where(is_lit, -(s_lit + in_tok) - 1, pos - s_off)

    # pointer doubling: chains of match references collapse in log rounds
    rounds = max(1, int(np.ceil(np.log2(max(total_out, 2)))))
    def round_fn(_, s):
        resolved = s < 0
        nxt = jnp.take(s, jnp.clip(s, 0, total_out - 1))
        return jnp.where(resolved, s, nxt)
    src = jax.lax.fori_loop(0, rounds, round_fn, src)

    out = jnp.take(lit_flat, jnp.clip(-src - 1, 0, lit_flat.shape[0] - 1))
    return out, blk_len


@functools.partial(jax.jit, static_argnames=("total_out", "max_steps",
                                             "max_tokens_total", "family_liz"))
def _decode_batch_jit(flags, lit, off16, off24, flags_off, flags_len,
                      lit_off, lit_len, off16_off, off24_off,
                      total_out, max_steps, max_tokens_total, family_liz):
    if family_liz:
        ll, ml, off, lit_start = token_parse_liz(
            flags, lit, off16, off24, flags_off, flags_len, lit_off, lit_len,
            off16_off, off24_off, max_steps)
    else:
        ll, ml, off, lit_start = token_parse_lz4(
            flags, lit, flags_off, flags_len, lit_off, lit_len, max_steps)
    return resolve_output(ll, ml, off, lit_start, flags_len, lit,
                          total_out, max_tokens_total)


def decode_batch(batch: BlockBatch, total_out: int):
    """Decode a BlockBatch on the default JAX device. Returns
    (bytes_array [total_out] uint8, per-block lengths)."""
    if batch.n_blocks == 0:
        return np.zeros(0, np.uint8), np.zeros(0, np.int32)
    max_steps = batch.max_tokens
    max_tokens_total = int((batch.flags_len + 1).sum())

    def pad(a):
        return np.concatenate([a, np.zeros(GUARD, np.uint8)])

    out, blk_len = _decode_batch_jit(
        jnp.asarray(pad(batch.flags)), jnp.asarray(pad(batch.literals)),
        jnp.asarray(pad(batch.off16)), jnp.asarray(pad(batch.off24)),
        jnp.asarray(batch.flags_off), jnp.asarray(batch.flags_len),
        jnp.asarray(batch.lit_off), jnp.asarray(batch.lit_len),
        jnp.asarray(batch.off16_off), jnp.asarray(batch.off24_off),
        total_out=int(total_out), max_steps=int(max_steps),
        max_tokens_total=max_tokens_total,
        family_liz=batch.codewords == Codewords.LIZv1)
    return np.asarray(out), np.asarray(blk_len)


def decompress_jax(src: bytes, max_out: int | None = None) -> bytes:
    """One-shot `Lizard_decompress_safe` equivalent on the JAX backend.
    `max_out` must be the exact decompressed size (static shape)."""
    from lizard_tpu.ops.split import new_accumulator, split_stream, finalize
    acc = new_accumulator()
    family = split_stream(src, acc, 0)
    batch = finalize(acc, family)
    if max_out is None:
        raise ValueError("decompress_jax requires max_out (static output size)")
    out, blk_len = decode_batch(batch, max_out)
    n = int(blk_len.sum())
    if n != max_out:
        out = out[:n]
    return bytes(out)
