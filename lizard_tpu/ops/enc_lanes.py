"""Lane-parallel Pallas TPU fastLZ4 encoder (phase 1: match finding).

This is the Pallas rebuild of ops/encode_tpu.py's dataflow (the XLA
formulation measured ~1.2 MB/s because general gathers/argsorts run at
~1e8 elem/s on this stack; see NOTES_ROUND2.md). The algorithm is the
segment-table scheme validated by tools/probe_enc_scheme*.py: ratio
within ~1% of the exact nearest-previous-occurrence sort on the bench
corpus, with every step expressible as native (8,128) tile ops.

Unit of parallelism: 8 independent 128 KB blocks ride the 8 sublanes
(sublane = block, the decoder's slot idiom); each fori iteration
processes one 128-byte SEGMENT of all 8 blocks (128 lanes = positions).

Phase 1 (this kernel) per segment:
  1. w8: the 4 LE bytes at every position (two in-lane gathers from the
     block's word array + a funnel shift).
  2. hash -> bucket; LOOKUP = gather chain over the interleaved bucket
     table (tile t holds buckets [t*128,+128) of all 8 blocks, one per
     sublane row).
  3. VERIFY the table candidate by a 4-byte compare fetched through a
     dynamic-base gather chain over the word window [p-maxoff, p].
  4. PROBE ladder: fixed small offsets answered from a ring of recent
     w8 rows (two lane-rolls each) for matches the lagged table cannot
     see.
  5. INSERT: scatter (bucket -> position) via one-hot MXU matmuls, one
     per block: C = rowOH(64,128l) @ X(128l,128c) where X packs
     onehot(col) * (lane*256+1), so a single f32 matmul yields both the
     inserted lane (sum>>8) and a duplicate counter (sum&255).
     Duplicate buckets within a segment (after adjacent-run dedupe)
     keep the OLD entry -- never garbage (probe_enc_scheme2.py showed
     garbage entries cost +5.5% ratio).

Output: packed (nseg*8, 128) candidate array (cand+1, 0 = none),
consumed by phase 2 (parse + emission).

Reference parity: the scheme replaces lib/lizard_parser_fast.h:41-196's
serial hash-table walk; stream layout produced by phase 2 matches
lizard_compress_lz4.h:3-71.
"""

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MINMATCH = 4
MFLIMIT = 12
LASTLITERALS = 5
LIZARD_MIN_LENGTH = 13
SEG = 128
RING = 16                     # w8 ring rows (probe reach: 15*128 bytes)
HMUL = 2654435761
BIGSENT = 1 << 24             # insert sentinel: never matches a bucket


@dataclass(frozen=True)
class EncCfg:
    n: int = 131072           # padded block size (bytes)
    hl: int = 13              # hash/table bits
    maxoff: int = 16383       # max match offset emitted
    min_offset: int = 8       # LIZARD_FAST_MIN_OFFSET (interop: >= 8)
    probes: tuple = (8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256,
                     384, 512, 768, 1024)

    @property
    def nw(self):
        return self.n // 4

    @property
    def wtiles(self):
        return self.nw // 128

    @property
    def nseg(self):
        return self.n // SEG

    @property
    def ttiles(self):
        return (1 << self.hl) // 128

    @property
    def nch(self):
        return (self.maxoff >> 9) + 2


def _iota0():
    return jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)


def _iota1():
    return jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)


def _shl(x, n):
    return jax.lax.shift_left(x, n.astype(jnp.uint32))


def _shr(x, n):
    return jax.lax.shift_right_logical(x, n.astype(jnp.uint32))


def _take(tile, idx):
    return jnp.take_along_axis(tile, idx, axis=1)


def _p1_kernel(cfg, meta, w32_hbm, packed_hbm, w32, table, ring, packed,
               cs, hts, sems):
    """meta: (8,) SMEM block lengths. w32/packed HBM; the rest VMEM."""
    lanes = _iota1()
    sub = _iota0()
    ttiles = cfg.ttiles
    trows = ttiles * 8 // 8   # bucket rows per block (= ttiles)

    cp_in = pltpu.make_async_copy(w32_hbm, w32, sems.at[0])
    cp_in.start()
    cp_in.wait()

    table[:, :] = jnp.zeros((ttiles * 8, 128), jnp.int32)

    nv = jnp.zeros((8, 128), jnp.int32)
    for b in range(8):
        nv = jnp.where(sub == b, meta[b], nv)

    def body(i, carry):
        p = i * SEG + lanes

        # ---- w8: 4 LE bytes at p --------------------------------------
        t0 = i >> 2
        c32 = 32 * i + (lanes >> 2)
        T0 = w32[pl.ds(t0 * 8, 8)]
        T1 = w32[pl.ds(jnp.minimum(t0 + 1, cfg.wtiles) * 8, 8)]
        wlo = jnp.where((c32 >> 7) == t0, _take(T0, c32 & 127),
                        _take(T1, c32 & 127))
        c32p = c32 + 1
        whi = jnp.where((c32p >> 7) == t0, _take(T0, c32p & 127),
                        _take(T1, c32p & 127))
        sh = (lanes & 3) << 3
        w8 = (_shr(wlo.astype(jnp.uint32), sh)
              | jnp.where(sh == 0, jnp.uint32(0),
                          _shl(whi.astype(jnp.uint32), (32 - sh) & 31)))

        h = (_shr(w8 * jnp.uint32(HMUL),
                  jnp.full((8, 128), 32 - cfg.hl, jnp.int32))
             ).astype(jnp.int32)

        ring[pl.ds((i & (RING - 1)) * 8, 8)] = w8.astype(jnp.int32)

        # ---- lookup ----------------------------------------------------
        hrow, hcol = h >> 7, h & 127
        acc = jnp.zeros((8, 128), jnp.int32)
        for k in range(ttiles):
            g = _take(table[k * 8:(k + 1) * 8], hcol)
            acc = jnp.where(hrow == k, g, acc)
        cand0 = acc - 1
        off0 = p - cand0

        # ---- verify (funnel over [p-maxoff, p]) ------------------------
        base = jnp.maximum(((i * SEG + 127) >> 9) - (cfg.nch - 1), 0)
        W0 = jnp.maximum(cand0, 0) >> 2
        W1 = W0 + 1
        a0 = jnp.zeros((8, 128), jnp.int32)
        a1 = jnp.zeros((8, 128), jnp.int32)
        for k in range(cfg.nch):
            tk = base + k
            tile = w32[pl.ds(tk * 8, 8)]
            a0 = jnp.where((W0 >> 7) == tk, _take(tile, W0 & 127), a0)
            a1 = jnp.where((W1 >> 7) == tk, _take(tile, W1 & 127), a1)
        sh2 = (jnp.maximum(cand0, 0) & 3) << 3
        wv = (_shr(a0.astype(jnp.uint32), sh2)
              | jnp.where(sh2 == 0, jnp.uint32(0),
                          _shl(a1.astype(jnp.uint32), (32 - sh2) & 31)))
        okT = ((acc > 0) & (wv == w8) & (off0 >= cfg.min_offset)
               & (off0 <= cfg.maxoff))
        best = jnp.where(okT, cand0, -1)

        # ---- probe ladder ---------------------------------------------
        w8i = w8.astype(jnp.int32)
        for d in cfg.probes:
            k0, rem = d >> 7, d & 127
            rA = ring[pl.ds(((i - k0) & (RING - 1)) * 8, 8)]
            rB = ring[pl.ds(((i - k0 - 1) & (RING - 1)) * 8, 8)]
            if rem:
                vA = pltpu.roll(rA, rem, 1)
                vB = pltpu.roll(rB, rem, 1)
                vd = jnp.where(lanes >= rem, vA, vB)
            else:
                vd = rA
            ok = (best < 0) & (p - d >= 0) & (vd == w8i)
            best = jnp.where(ok, p - d, best)

        mask = (p < nv - MFLIMIT) & (nv >= LIZARD_MIN_LENGTH)
        packed[pl.ds(i * 8, 8)] = jnp.where(mask, best, -1) + 1

        # ---- insert ----------------------------------------------------
        hnext = pltpu.roll(h, 127, 1)         # h[l+1] (wraps at 127)
        keep = ((lanes == 127) | (h != hnext)) & (p < nv)
        hins = jnp.where(keep, h, BIGSENT)
        hts[0:8] = hins
        ht = jnp.transpose(hts[:, :])          # ht[l, b] = hins[b, l]
        l256 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) * 256 + 1
        cc = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        tt64 = jax.lax.broadcasted_iota(jnp.int32, (trows, 128), 0)
        for b in range(8):
            hb = jnp.broadcast_to(hins[b:b + 1, :], (trows, 128))
            rowOH = (hb >> 7 == tt64).astype(jnp.float32)
            hc = jnp.broadcast_to(ht[:, b:b + 1], (128, 128))
            X = jnp.where((hc & 127) == cc, l256, 0).astype(jnp.float32)
            C = jax.lax.dot_general(
                rowOH, X, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            cnt = C & 255
            newv = i * SEG + (C >> 8) + 1
            cs[b * trows:(b + 1) * trows] = jnp.where(cnt == 1, newv, 0)

        # apply: interleaved tile t rows = (t, b=0..7)
        for t in range(trows):
            upd = jnp.zeros((8, 128), jnp.int32)
            for b in range(8):
                row = cs[b * trows + t:b * trows + t + 1, :]
                upd = jnp.where(sub == b,
                                jnp.broadcast_to(row, (8, 128)), upd)
            old = table[t * 8:(t + 1) * 8]
            table[t * 8:(t + 1) * 8] = jnp.where(upd > 0, upd, old)
        return carry

    jax.lax.fori_loop(0, cfg.nseg, body, 0)

    cp_out = pltpu.make_async_copy(packed, packed_hbm, sems.at[1])
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def p1_call(w32i, meta, cfg: EncCfg, interpret=False):
    """w32i: (wtiles*8, 128) i32 interleaved words (tile t row b =
    words [t*128,+128) of block b). meta: (8,) i32 block lengths.
    Returns packed (nseg*8, 128) i32: cand+1 per position."""
    kernel = functools.partial(_p1_kernel, cfg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(((cfg.wtiles + 1) * 8, 128), jnp.int32),
            pltpu.VMEM((cfg.ttiles * 8, 128), jnp.int32),
            pltpu.VMEM((RING * 8, 128), jnp.int32),
            pltpu.VMEM((cfg.nseg * 8, 128), jnp.int32),
            pltpu.VMEM((8 * cfg.ttiles, 128), jnp.int32),
            pltpu.VMEM((128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cfg.nseg * 8, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, w32i)


# ------------------------------------------------------------- host util

def pack_blocks(blocks, cfg: EncCfg):
    """blocks: <=8 byte strings, each <= cfg.n. Returns (w32i, meta)."""
    u8 = np.zeros((8, cfg.n), np.uint8)
    meta = np.zeros((8,), np.int32)
    for b, d in enumerate(blocks):
        u8[b, :len(d)] = np.frombuffer(d, np.uint8)
        meta[b] = len(d)
    w = u8.view("<u4").astype(np.int32)           # (8, nw)
    w32i = (w.reshape(8, cfg.wtiles, 128)
            .transpose(1, 0, 2).reshape(cfg.wtiles * 8, 128))
    # one trailing zero tile: the kernel clamps word W+1 reads into it,
    # giving exact zero-padded funnel semantics at the block tail
    w32i = np.concatenate([w32i, np.zeros((8, 128), np.int32)], axis=0)
    return w32i, meta


def p1_reference(blocks, cfg: EncCfg):
    """Bit-exact numpy mirror of the phase-1 kernel (the test oracle)."""
    u8 = np.zeros((8, cfg.n), np.uint8)
    meta = np.zeros((8,), np.int64)
    for b, d in enumerate(blocks):
        u8[b, :len(d)] = np.frombuffer(d, np.uint8)
        meta[b] = len(d)
    out = np.zeros((8, cfg.n), np.int64)
    for b in range(8):
        n = meta[b]
        wpad = np.zeros(cfg.n + 4, np.uint8)
        wpad[:cfg.n] = u8[b]
        w8 = (wpad[:cfg.n].astype(np.uint32)
              | wpad[1:cfg.n + 1].astype(np.uint32) << 8
              | wpad[2:cfg.n + 2].astype(np.uint32) << 16
              | wpad[3:cfg.n + 3].astype(np.uint32) << 24)
        # kernel funnel: word W and W+1 with W+1 clamped to the last
        # word of the LAST TILE (wtiles*128-1); positions whose W+1
        # exceeds it read the clamped tile -- only affects p >= n-3
        # which is masked out anyway (n - MFLIMIT).
        h = ((w8 * np.uint32(HMUL)) >> np.uint32(32 - cfg.hl)).astype(
            np.int64)
        table = np.zeros(1 << cfg.hl, np.int64)   # stores pos+1
        cand = np.full(cfg.n, -1, np.int64)
        pos = np.arange(cfg.n)
        for i in range(cfg.nseg):
            seg = slice(i * SEG, (i + 1) * SEG)
            ps = pos[seg]
            hs = h[seg]
            v = table[hs]
            c0 = v - 1
            off = ps - c0
            okT = ((v > 0) & (w8[np.clip(c0, 0, cfg.n - 1)] == w8[seg])
                   & (off >= cfg.min_offset) & (off <= cfg.maxoff))
            best = np.where(okT, c0, -1)
            for d in cfg.probes:
                c = ps - d
                ok = (best < 0) & (c >= 0) & (
                    w8[np.clip(c, 0, cfg.n - 1)] == w8[seg])
                best = np.where(ok, c, best)
            mask = (ps < n - MFLIMIT) & (n >= LIZARD_MIN_LENGTH)
            cand[seg] = np.where(mask, best, -1)
            # insert: adjacent dedupe (keep last of each run; lane 127
            # always kept), duplicates after dedupe keep the OLD entry
            keep = np.ones(SEG, bool)
            keep[:-1] = hs[:-1] != hs[1:]
            keep &= ps < n
            hk, pk = hs[keep], ps[keep]
            uniq, inv, cnt = np.unique(hk, return_inverse=True,
                                       return_counts=True)
            lastp = np.zeros(len(uniq), np.int64)
            lastp[inv] = pk                     # later writes win
            one = cnt == 1
            table[uniq[one]] = lastp[one] + 1
        out[b] = cand
    return out, meta
