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

Phase-1 output: cfg.nmaps d16-packed candidate arrays, row-stacked
((nmaps*nseg/2*8, 128): two segments per row, bits [0,16) = match
DISTANCE at even segments, [16,32) odd; 0 = none; d <= maxoff < 2^16).
Map 0 merges the h4 table + probe ladder (and, at k5=1, the verified
5-byte-hash winner); maps 1..k5 are the rotating-slot 5-byte-hash
chain (quality tiers, cfg_for_level).

Pass A (the parse) and pass B (host emission for all four level
families) follow below; the whole pipeline is token-exact against the
numpy mirrors (p1_reference/p2_reference).

Reference parity: the scheme replaces lib/lizard_parser_fast.h:41-196's
serial hash-table walk (back-extension :102, lazy retry :146-181);
emitted stream layouts match lizard_compress_lz4.h:3-71 and
lizard_compress_liz.h:43-165.
"""

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lizard_tpu.format.constants import (     # noqa: E402
    MINMATCH,                  # 4
    MFLIMIT,                   # 20: last match starts before n-20
    LASTLITERALS,              # 16: last 16 bytes stay literal
    LIZARD_MIN_LENGTH,         # 21 (lizard_common.h:78-81)
)

import os as _os

_ENC_UNR = int(_os.environ.get("LANE_ENC_UNR", "2"))  # w_body per w_cond

SEG = 128
RING = 16                     # w8 ring rows (probe reach: 15*128 bytes)
HMUL = 2654435761
H5MIX = 0x9E3B                # 5th-byte mix constant for the h5 table
BIGSENT = 1 << 24             # insert sentinel: never matches a bucket


@dataclass(frozen=True)
class EncCfg:
    n: int = 131072           # padded block size (bytes)
    hl: int = 13              # hash/table bits
    maxoff: int = 16383       # max match offset emitted
    min_offset: int = 8       # LIZARD_FAST_MIN_OFFSET (interop: >= 8)
    probes: tuple = (8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256,
                     384, 512, 768, 1024)
    tok_rows: int = 448       # token-buffer rows (448*42 = 18816 slots;
                              # overflow -> host fallback, see pass A).
                              # Sized for the unrolled while (up to one
                              # null slot per _ENC_UNR-step at ~16 real
                              # iterations/segment)
    lazy: int = 0             # lazy look-ahead steps in pass A (0-2);
                              # True == 1 (bool-compatible)
    k5: int = 0               # 5-byte-hash tables: 0 = none; 1 = one
                              # table whose verified candidate wins
                              # (merged, pass A untouched); >= 2 = k5
                              # rotating-slot tables (~"k5 latest" per
                              # bucket) emitted as separate candidate
                              # arrays — pass A extends every candidate
                              # and keeps the longest (quality tiers,
                              # levels 13+)
    chain: int = 0            # hash-chain walk depth (phase 1.5).
                              # chain > 0 adds one DELTA map to phase
                              # 1's output: delta[p] = p - previous
                              # h4-bucket occupant (the reference's
                              # DELTANEXT, lib/lizard_parser_hashchain.h
                              # :13-43, batched per segment; it falls
                              # out of the lookup phase 1 already does).
                              # Phase 1.5 (p15_call) then walks
                              # c -= delta[c] VECTORIZED per position,
                              # ranks nodes by the first cfg.pref matched
                              # bytes (strictly-longer wins, so nearest
                              # wins ties; unverified nodes need >= 4),
                              # and replaces map 0 with the winner, so
                              # the serial parse never pays for the
                              # walk. Ratio vs the in-parse walk at
                              # equal depth: -0.4%..0%, and the cheap
                              # vector pass affords 2x the depth
                              # (measured: prewalk chain=32 == in-parse
                              # chain=16 at hl15 on the bench corpus).
    pref: int = 8             # chain ranking depth in bytes (8 or 16):
                              # how many matched bytes phase 1.5 counts
                              # before declaring two nodes tied. 16
                              # recovers the pre-pick's ratio loss
                              # almost exactly (chain=16 hl15: p8
                              # 0.5190, p16 0.5147 vs in-parse 0.5152)
                              # for pref/4+1 gathered words per eval.

    far_dist: int = 65536     # far-table delay in bytes (multiple of
                              # SEG*4; tests shrink it with cfg.n —
                              # production keeps the off24 boundary)
    far: int = 0              # off24 candidates (LIZv1 families): one
                              # extra hash table whose inserts run 64 KB
                              # DELAYED (at segment i it indexes segment
                              # i-512), so its hits are all >= 65536
                              # away; candidates ship UNVERIFIED in one
                              # extra d16 map (raw = distance - 65535)
                              # and pass A's fetch verifies + enforces
                              # the format's MM_LONGOFF >= 16 rule
                              # (lib/lizard_common.h:223-231,
                              # lizard_compress_liz.h:92-136). Reach is
                              # within-block (65536..131070).

    @property
    def nmaps(self):
        """Candidate arrays emitted by phase 1 (order: h4+probes,
        k5 slots, FAR map, DELTA map — the far map always precedes the
        delta map; chain tiers don't use far)."""
        assert not (self.far and self.chain), "far+chain not supported"
        base = 1 if self.k5 <= 1 else 1 + self.k5
        return base + (1 if self.far else 0) + (1 if self.chain else 0)

    @property
    def ncand(self):
        """Candidate arrays pass A reads: phase 1.5 consumes the delta
        map and folds the chain winner into map 0."""
        return self.nmaps - (1 if self.chain else 0)

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


_CHK1 = -2048144789          # 0x85EBCA6B (xxhash avalanche constants)
_CHK2 = -1028477379          # 0xC2B2AE35
_CHK3 = 668265263
_HMULI = -1640531535         # HMUL as wrapped int32


def _chk13(wrow):
    """13-bit checksum of the 16 bytes starting at each lane's position,
    from the segment's w8 row (int32): lanes l+4/l+8/l+12 via circular
    rolls. Lanes > 115 mix wrapped values — insert and lookup wrap
    differently there, so tail-lane far candidates self-drop (~9%
    coverage loss per segment)."""
    m = (wrow
         ^ (pltpu.roll(wrow, 124, 1) * _CHK1)
         ^ (pltpu.roll(wrow, 120, 1) * _CHK2)
         ^ (pltpu.roll(wrow, 116, 1) * _CHK3))
    h = _shr((m * _HMULI).astype(jnp.uint32),
             jnp.full((8, 128), 19, jnp.int32))
    return (h & 8191).astype(jnp.int32)


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

    ntab = 1 + cfg.k5 + (1 if cfg.far else 0)
    table[:, :] = jnp.zeros((ntab * ttiles * 8, 128), jnp.int32)

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

        k5 = cfg.k5
        if k5:
            # 5-byte hash: the 5th byte is free (whi holds words W+1)
            b4 = _shr(whi.astype(jnp.uint32), sh) & 255
            h5v = (_shr((w8 ^ (b4 * jnp.uint32(H5MIX)))
                        * jnp.uint32(HMUL),
                        jnp.full((8, 128), 32 - cfg.hl, jnp.int32))
                   ).astype(jnp.int32)

        # ---- lookup: h4 table 0; h5 rotating slots are tables 1..k5 ---
        def lookup(tix, h_t):
            hrow, hcol = h_t >> 7, h_t & 127
            acc = jnp.zeros((8, 128), jnp.int32)
            for k in range(ttiles):
                g = _take(table[(tix * ttiles + k) * 8:
                                (tix * ttiles + k + 1) * 8], hcol)
                acc = jnp.where(hrow == k, g, acc)
            return acc

        accs = [lookup(0, h)]
        for j in range(k5):
            accs.append(lookup(1 + j, h5v))
        nsets = len(accs)

        # ---- verify (merged dynamic-reach funnel, all candidate sets) -
        # (lane_decode band_emit_all idiom): a static NEAR-tile walk
        # covers the common small offsets; one scalar reduce sizes the
        # far loop so a 64 KB maxoff costs only what the segment's
        # candidates actually reach
        zt = jnp.zeros((8, 128), jnp.int32)
        c0s = [acc - 1 for acc in accs]
        off0s = [p - c0 for c0 in c0s]
        okds = [(acc > 0) & (o >= cfg.min_offset) & (o <= cfg.maxoff)
                for acc, o in zip(accs, off0s)]
        W0s = [jnp.maximum(c0, 0) >> 2 for c0 in c0s]
        a0s = [zt] * nsets
        a1s = [zt] * nsets
        Ttop = i >> 2
        NEARV = min(ENC_NEAR + 1, cfg.nch)

        def vstep(tk, a0s, a1s):
            tc = jnp.maximum(tk, 0)
            tile = w32[pl.ds(tc * 8, 8)]
            a0s = [jnp.where((W0 >> 7) == tk, _take(tile, W0 & 127), a0)
                   for W0, a0 in zip(W0s, a0s)]
            a1s = [jnp.where(((W0 + 1) >> 7) == tk,
                             _take(tile, (W0 + 1) & 127), a1)
                   for W0, a1 in zip(W0s, a1s)]
            return a0s, a1s

        for k in range(NEARV + 1):
            a0s, a1s = vstep(Ttop - k, a0s, a1s)
        dmaxv = zt
        for okd, o in zip(okds, off0s):
            dmaxv = jnp.maximum(dmaxv, jnp.where(okd, o, 0))
        dmaxs = jnp.max(dmaxv)
        kfarv = jnp.maximum(
            Ttop - ((i * SEG - dmaxs) >> 9) - NEARV, 0)

        def vfar(q, aa):
            return vstep(Ttop - (NEARV + 1) - q, *aa)

        a0s, a1s = jax.lax.fori_loop(0, kfarv, vfar, (a0s, a1s))
        okTs = []
        for t in range(nsets):
            sh2 = (jnp.maximum(c0s[t], 0) & 3) << 3
            wv = (_shr(a0s[t].astype(jnp.uint32), sh2)
                  | jnp.where(sh2 == 0, jnp.uint32(0),
                              _shl(a1s[t].astype(jnp.uint32),
                                   (32 - sh2) & 31)))
            okTs.append(okds[t] & (wv == w8))
        best = jnp.where(okTs[0], c0s[0], -1)

        # ---- probe ladder (fills h4-table misses) ---------------------
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

        emit_ok = (p < nv - MFLIMIT) & (nv >= LIZARD_MIN_LENGTH)
        if k5 == 1:
            # one merged array: the verified 5-byte candidate wins
            best = jnp.where(okTs[1], c0s[1], best)
            bests = [best]
        elif k5 >= 2:
            bests = [best] + [jnp.where(okTs[1 + j], c0s[1 + j], -1)
                              for j in range(k5)]
        else:
            bests = [best]

        dhalves = list(carry)
        CR2 = cfg.nseg // 2 * 8
        d16s = []
        for bm in bests:
            mask = emit_ok & (bm >= 0)
            d16s.append(jnp.where(mask, p - bm, 0))
        if cfg.far:
            # FAR map. Table entries carry ((pos+1) << 13) | chk13 where
            # chk13 hashes the position's FIRST 16 BYTES: a lookup whose
            # checksum matches is (whp) a >= 16-byte match, so the
            # MM_LONGOFF >= 16 gate in pass A almost never fires and the
            # parse never serializes on spurious 4-byte far hits. Pass A
            # still exact-verifies the bytes. raw = d - (far_dist-1).
            FD = cfg.far_dist
            far_tix = 1 + k5
            accF = lookup(far_tix, h)
            jpos = (accF >> 13) - 1
            chk_c = _chk13(w8.astype(jnp.int32))
            offF = p - jpos
            okF = ((accF > 0) & ((accF & 8191) == chk_c)
                   & (offF >= FD) & (offF <= 2 * FD - 2))
            d16s.append(jnp.where(emit_ok & okF, offF - (FD - 1), 0))
        if cfg.chain:
            # DELTA map (last map): per-position distance to the
            # pre-segment h4-bucket occupant, unverified/uncapped
            # (mirrors p2_reference; falls out of accs[0])
            dl = p - (accs[0] - 1)
            d16s.append(jnp.where((accs[0] > 0) & (dl < (1 << 16)),
                                  dl, 0))
        for m, d16 in enumerate(d16s):
            @pl.when((i & 1) == 1)
            def _(m=m, d16=d16):
                packed[pl.ds(m * CR2 + (i >> 1) * 8, 8)] = \
                    dhalves[m] | (d16 << 16)

            dhalves[m] = d16

        # ---- insert (h4 always table 0; h5 the rotating slot; the far
        # table indexes segment i-512 — same machinery, delayed keys) --
        ins = [(h, 0, i * SEG, p < nv, None)]
        if k5:
            ins.append((h5v, 1 + (i & (k5 - 1)), i * SEG, p < nv, None))
        if cfg.far:
            FARSEG = cfg.far_dist // SEG
            jseg = jnp.maximum(i - FARSEG, 0)
            t0d = jseg >> 2
            c32d = 32 * jseg + (lanes >> 2)
            T0d = w32[pl.ds(t0d * 8, 8)]
            T1d = w32[pl.ds(jnp.minimum(t0d + 1, cfg.wtiles) * 8, 8)]
            wlod = jnp.where((c32d >> 7) == t0d, _take(T0d, c32d & 127),
                             _take(T1d, c32d & 127))
            c32dp = c32d + 1
            whid = jnp.where((c32dp >> 7) == t0d, _take(T0d, c32dp & 127),
                             _take(T1d, c32dp & 127))
            w8d = (_shr(wlod.astype(jnp.uint32), sh)
                   | jnp.where(sh == 0, jnp.uint32(0),
                               _shl(whid.astype(jnp.uint32),
                                    (32 - sh) & 31)))
            hd = (_shr(w8d * jnp.uint32(HMUL),
                       jnp.full((8, 128), 32 - cfg.hl, jnp.int32))
                  ).astype(jnp.int32)
            pdv = jseg * SEG + lanes
            chkd = _chk13(w8d.astype(jnp.int32))
            ins.append((hd, 1 + k5, jseg * SEG,
                        (pdv < nv) & (i >= FARSEG), chkd))
        lrow = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        tt64 = jax.lax.broadcasted_iota(jnp.int32, (trows, 128), 0)
        for h_t, tix, base_p, pmask, chkrow in ins:
            hnext = pltpu.roll(h_t, 127, 1)       # h[l+1] (wraps at 127)
            keep = ((lanes == 127) | (h_t != hnext)) & pmask
            hins = jnp.where(keep, h_t, BIGSENT)
            hts[0:8] = hins
            ht = jnp.transpose(hts[:, :])         # ht[l, b] = hins[b, l]
            for b in range(8):
                hb = jnp.broadcast_to(hins[b:b + 1, :], (trows, 128))
                rowOH = (hb >> 7 == tt64).astype(jnp.float32)
                hc = jnp.broadcast_to(ht[:, b:b + 1], (128, 128))
                # The MXU rounds f32 operands through bf16 (only integers
                # <= 256 survive exactly), so the count and the lane index
                # must ride SEPARATE matmuls with small-int planes; a
                # packed l*256+1 plane decodes wrong on hardware.
                match = (hc & 127) == cc
                X1 = match.astype(jnp.float32)
                Xl = jnp.where(match, lrow, 0).astype(jnp.float32)
                cnt = jax.lax.dot_general(
                    rowOH, X1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
                Cl = jax.lax.dot_general(
                    rowOH, Xl, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
                newv = base_p + Cl + 1
                if chkrow is not None:
                    # far entries carry ((pos+1) << 13) | chk13 of the
                    # inserted lane (gather the winner lane's checksum)
                    chk_b = jnp.broadcast_to(chkrow[b:b + 1, :],
                                             (trows, 128))
                    chk_at = _take(chk_b, jnp.clip(Cl, 0, 127))
                    newv = (newv << 13) | chk_at
                cs[b * trows:(b + 1) * trows] = jnp.where(cnt == 1, newv, 0)

            # apply: interleaved tile k rows = (tix*ttiles + k, b=0..7)
            for k in range(trows):
                upd = jnp.zeros((8, 128), jnp.int32)
                for b in range(8):
                    row = cs[b * trows + k:b * trows + k + 1, :]
                    upd = jnp.where(sub == b,
                                    jnp.broadcast_to(row, (8, 128)), upd)
                r0 = (tix * ttiles + k) * 8
                old = table[pl.ds(r0, 8)]
                table[pl.ds(r0, 8)] = jnp.where(upd > 0, upd, old)
        return tuple(dhalves)

    assert cfg.nseg % 2 == 0
    zi = jnp.zeros((8, 128), jnp.int32)
    jax.lax.fori_loop(0, cfg.nseg, body,
                      tuple(zi for _ in range(cfg.nmaps)))

    cp_out = pltpu.make_async_copy(packed, packed_hbm, sems.at[1])
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def p1_call(w32i, meta, cfg: EncCfg, interpret=False):
    """w32i: (wtiles*8, 128) i32 interleaved words (tile t row b =
    words [t*128,+128) of block b). meta: (8,) i32 block lengths.
    Returns packed (nseg/2*8, 128) i32: per position, the match
    DISTANCE (0 = none) — even segment in bits [0,16), odd in
    [16,32)."""
    kernel = functools.partial(_p1_kernel, cfg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(((cfg.wtiles + 1) * 8, 128), jnp.int32),
            pltpu.VMEM(((1 + cfg.k5 + (1 if cfg.far else 0))
                        * cfg.ttiles * 8, 128), jnp.int32),
            pltpu.VMEM((RING * 8, 128), jnp.int32),
            pltpu.VMEM((cfg.nmaps * (cfg.nseg // 2) * 8, 128),
                       jnp.int32),
            pltpu.VMEM((8 * cfg.ttiles, 128), jnp.int32),
            pltpu.VMEM((128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (cfg.nmaps * (cfg.nseg // 2) * 8, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, w32i)


# ------------------------------------------------------------- phase 1.5
#
# The hash-chain walk (cfg.chain > 0), VECTORIZED per position: all 128
# lanes x 8 blocks of a segment walk their delta chains simultaneously,
# ranking each node by its first cfg.pref matched bytes. The serial parse
# (pass A) then sees a single pre-picked winner in map 0 and never pays
# for the walk — the structural reason the chain feature is affordable
# on this hardware (a per-token walk inside pass A's latency-bound
# while-loop costs chain x ~10 serial ops per token; here the same work
# is (8,128)-wide vector ops whose gathers ride the dynamic-reach
# funnel, so depth is cheap and the tier ladder buys ratio with depth).
# Mirrors lib/lizard_parser_hashchain.h:46-107's search loop; ranking
# by a pref-byte prefix instead of the full length costs 0..0.4% ratio
# at equal depth on the bench corpus (tools/probe_enc_chain.py) and
# doubling the depth recovers it.

NEAR_D = 2                    # delta-map tiles always chained (512 pos)


def _p15_kernel(cfg, meta, w32_hbm, packed_hbm, out_hbm,
                w32, cmap, dmapv, outm, sems):
    lanes = _iota1()
    CR2 = cfg.nseg // 2 * 8
    z = jnp.zeros((8, 128), jnp.int32)

    cpw = pltpu.make_async_copy(w32_hbm, w32, sems.at[0])
    cpw.start()
    cpc = pltpu.make_async_copy(packed_hbm.at[pl.ds(0, CR2)], cmap,
                                sems.at[1])
    cpc.start()
    cpd = pltpu.make_async_copy(
        packed_hbm.at[pl.ds((cfg.nmaps - 1) * CR2, CR2)], dmapv,
        sems.at[2])
    cpd.start()
    cpw.wait()
    cpc.wait()
    cpd.wait()

    NWORDS = cfg.pref // 4 + 1   # words covering pref bytes, any align

    def body(i, dhalf):
        X0 = i * SEG
        p = X0 + lanes
        raw = cmap[pl.ds((i >> 1) * 8, 8)]
        cand = jnp.where((i & 1) == 1, raw >> 16, raw) & 0xFFFF

        # target bytes [p, p+pref): words c32 .. c32+NWORDS-1 (two
        # static tiles cover the segment; the tail words may spill into
        # tile t0+1)
        t0 = i >> 2
        c32 = 32 * i + (lanes >> 2)
        sh = (lanes & 3) << 3
        T0 = w32[pl.ds(t0 * 8, 8)]
        T1 = w32[pl.ds(jnp.minimum(t0 + 1, cfg.wtiles) * 8, 8)]

        def wsel(cw):
            return jnp.where((cw >> 7) == t0, _take(T0, cw & 127),
                             _take(T1, cw & 127))

        tws = [wsel(c32 + j) for j in range(NWORDS)]
        tgt = [(_shr(tws[j].astype(jnp.uint32), sh)
                | jnp.where(sh == 0, jnp.uint32(0),
                            _shl(tws[j + 1].astype(jnp.uint32),
                                 (32 - sh) & 31)))
               for j in range(NWORDS - 1)]

        Ttop = i >> 2
        SPILL = 1     # tail words reach at most one tile above Ttop
                      # (max word = 32i+31 + NWORDS-1, NWORDS <= 5)

        def plen_at(dist, act):
            """Matched-prefix bytes (capped cfg.pref) of p vs p-dist:
            gather words W..W+NWORDS-1 at y = p-dist through the
            dynamic-reach funnel, xor against the segment's own
            pref bytes."""
            y = jnp.where(act, p - dist, p)
            wi = y >> 2
            wts = [(wi + j) >> 7 for j in range(NWORDS)]

            def vstep(t_un, a):
                tc = jnp.clip(t_un, 0, cfg.wtiles)
                tile = w32[pl.ds(tc * 8, 8)]
                return tuple(
                    jnp.where(wts[j] == t_un,
                              _take(tile, (wi + j) & 127), a[j])
                    for j in range(NWORDS))

            aa = tuple(z for _ in range(NWORDS))
            for k in range(SPILL):            # tail-word spillover
                aa = vstep(Ttop + SPILL - k, aa)
            for k in range(ENC_NEAR + 1):
                aa = vstep(Ttop - k, aa)
            dmax = jnp.max(jnp.where(act, dist, 0))
            kfar = jnp.maximum(
                (Ttop - ((X0 - dmax) >> 9)) - ENC_NEAR, 0)
            aa = jax.lax.fori_loop(
                0, kfar,
                lambda q, a: vstep(Ttop - (ENC_NEAR + 1) - q, a), aa)
            shs = (y & 3) << 3
            xws = []
            for j in range(NWORDS - 1):
                sw = (_shr(aa[j].astype(jnp.uint32), shs)
                      | jnp.where(shs == 0, jnp.uint32(0),
                                  _shl(aa[j + 1].astype(jnp.uint32),
                                       (32 - shs) & 31)))
                xws.append((sw ^ tgt[j]).astype(jnp.int32))

            def tzb(x):
                return jnp.where(
                    (x & 0xFF) != 0, 0,
                    jnp.where((x & 0xFFFF) != 0, 1,
                              jnp.where((x & 0xFFFFFF) != 0, 2, 3)))

            ln = jnp.full((8, 128), cfg.pref, jnp.int32)
            for j in reversed(range(NWORDS - 1)):
                ln = jnp.where(xws[j] != 0, 4 * j + tzb(xws[j]), ln)
            return jnp.where(act & (dist > 0), ln, 0)

        Dtop = i >> 1                 # delta tile-block of X0

        def dget(q, act):
            """delta[q] through the d16-packed map (256 positions per
            8-row tile block), dynamic-reach funnel."""
            qq = jnp.where(act, q, X0)
            tq = qq >> 8

            def dstep(t_un, dn):
                tc = jnp.maximum(t_un, 0)
                tile = dmapv[pl.ds(tc * 8, 8)]
                g = _take(tile, qq & 127)
                v16 = jnp.where(((qq >> 7) & 1) == 1, g >> 16,
                                g) & 0xFFFF
                return jnp.where(tq == t_un, v16, dn)

            dn = z
            for k in range(NEAR_D + 1):
                dn = dstep(Dtop - k, dn)
            qmin = jnp.min(jnp.where(act, qq, X0))
            kfar = jnp.maximum((Dtop - (qmin >> 8)) - NEAR_D, 0)
            dn = jax.lax.fori_loop(
                0, kfar,
                lambda k, d: dstep(Dtop - (NEAR_D + 1) - k, d), dn)
            return jnp.where(act, dn, 0)

        act0 = cand > 0
        best_l = plen_at(cand, act0)
        best_d = jnp.where(act0, cand, 0)
        cur = best_d
        walking = act0
        for _s in range(int(cfg.chain)):
            nd = dget(p - cur, walking)
            cur2 = cur + nd
            valid = walking & (nd > 0) & (cur2 <= cfg.maxoff)
            ln = plen_at(cur2, valid)
            take = valid & (ln >= 4) & (ln > best_l)
            best_d = jnp.where(take, cur2, best_d)
            best_l = jnp.where(take, ln, best_l)
            cur = jnp.where(valid, cur2, cur)
            walking = valid

        @pl.when((i & 1) == 1)
        def _():
            outm[pl.ds((i >> 1) * 8, 8)] = dhalf | (best_d << 16)

        return best_d

    jax.lax.fori_loop(0, cfg.nseg, body, z)

    cp0 = pltpu.make_async_copy(outm, out_hbm.at[pl.ds(0, CR2)],
                                sems.at[0])
    cp0.start()
    cp0.wait()
    # pass-through: the k5 maps keep their slots (bounced via outm,
    # which map 0 no longer needs)
    for m in range(1, cfg.ncand):
        cpi = pltpu.make_async_copy(
            packed_hbm.at[pl.ds(m * CR2, CR2)], outm, sems.at[1])
        cpi.start()
        cpi.wait()
        cpo = pltpu.make_async_copy(
            outm, out_hbm.at[pl.ds(m * CR2, CR2)], sems.at[2])
        cpo.start()
        cpo.wait()


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def p15_call(w32i, packed, meta, cfg: EncCfg, interpret=False):
    """Phase 1.5: consume phase 1's candidate+delta maps, return pass
    A's maps (ncand * nseg/2 * 8, 128) with map 0 = the chain winner."""
    kernel = functools.partial(_p15_kernel, cfg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(((cfg.wtiles + 1) * 8, 128), jnp.int32),
            pltpu.VMEM((cfg.nseg // 2 * 8, 128), jnp.int32),
            pltpu.VMEM((cfg.nseg // 2 * 8, 128), jnp.int32),
            pltpu.VMEM((cfg.nseg // 2 * 8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (cfg.ncand * (cfg.nseg // 2) * 8, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, w32i, packed)


# ---------------------------------------------------------------- pass A
#
# The parse. Segment-synchronized serial greedy, 8 blocks on sublanes:
# an outer fori walks the 128-byte segments (the fori index keeps every
# cand/word read statically addressed); an inner while processes ONE
# token per sublane per iteration:
#   - a pending match carried from the previous segment is extended by
#     a segment-wide eq-row first (at most one per sublane per segment),
#   - otherwise the sublane acquires the first candidate at/after its
#     cursor (lane min-reduce) and extends it the same way.
# The eq-row fetches the 128 source bytes at (segment_start - d) by a
# funnel gather over the w32 word tiles: a static NEAR-tile chain plus
# a dynamic far loop driven by the iteration's max offset -- the lane
# decoder's dynamic-reach trick (lane_decode.py band_emit_all). A first
# mismatching word + trailing-zero-byte count gives the byte-exact
# match length (reference semantics, lib/lizard_parser_fast.h:41-196);
# an all-equal row carries the token into the next segment.
#
# Tokens (s, ml, d) pack 42 per (8,128) row (3 lanes each, slot = the
# global iteration counter, dynamic-roll placement); ml=0 slots are
# idle-iteration nulls the host filters out.

TPR = 42                      # tokens (iteration slots) per output row
ENC_NEAR = 4                  # source tiles always chained (d <= 2 KB+)

import os as _os                                            # noqa: E402
_ENC_ABL = _os.environ.get("LANE_ENC_ABL", "")  # "chain" = ablation


def _pA_kernel(cfg, MAXROWS, il, meta, w32_hbm, cand_hbm, tok_hbm,
               w32, cand, tok, sems):
    """il groups of 8 blocks interleaved per while-iteration (the lane
    decoder's latency-hiding idiom): independent groups' serial chains
    pipeline each other. State/inputs/outputs are row-stacked per
    group; the iteration counter/slot/row are shared (a group with no
    work this iteration emits a null slot)."""
    lanes = _iota1()
    sub = _iota0()
    nseg = cfg.nseg
    WR = (cfg.wtiles + 1) * 8           # w32 rows per group
    CR2 = cfg.nseg // 2 * 8             # cand rows per map
    CR = cfg.nmaps * CR2                # cand rows per group
    TR = (MAXROWS + 1) * 8              # tok rows per group
    # pass A is always handed a chain-free cfg: when cfg.chain, phase
    # 1.5 (p15_call) pre-picks the chain winner into map 0 and drops
    # the delta map before the parse ever runs
    assert not cfg.chain

    cp0 = pltpu.make_async_copy(w32_hbm, w32, sems.at[0])
    cp0.start()
    cp1 = pltpu.make_async_copy(cand_hbm, cand, sems.at[1])
    cp1.start()
    tok[:, :] = jnp.zeros((il * TR, 128), jnp.int32)
    cp0.wait()
    cp1.wait()

    limvs = []
    for g in range(il):
        nv = jnp.zeros((8, 128), jnp.int32)
        for b in range(8):
            nv = jnp.where(sub == b, meta[g * 8 + b], nv)
        limvs.append(nv - LASTLITERALS)

    z = jnp.zeros((8, 128), jnp.int32)
    NST = 5                              # per-group carried tiles

    def seg_body(i, st):
        X0 = i * SEG
        p = X0 + lanes
        t0 = i >> 2
        c32 = 32 * i + (lanes >> 2)
        c32p = c32 + 1
        sh = (lanes & 3) << 3

        w8cs, drows, valids = [], [], []
        for g in range(il):
            T0 = w32[pl.ds(g * WR + t0 * 8, 8)]
            T1 = w32[pl.ds(g * WR
                           + jnp.minimum(t0 + 1, cfg.wtiles) * 8, 8)]
            wlo = jnp.where((c32 >> 7) == t0, _take(T0, c32 & 127),
                            _take(T1, c32 & 127))
            whi = jnp.where((c32p >> 7) == t0, _take(T0, c32p & 127),
                            _take(T1, c32p & 127))
            w8cs.append(_shr(wlo.astype(jnp.uint32), sh)
                        | jnp.where(sh == 0, jnp.uint32(0),
                                    _shl(whi.astype(jnp.uint32),
                                         (32 - sh) & 31)))
            dr = []
            vu = None
            for m in range(cfg.nmaps):
                raw = cand[pl.ds(g * CR + m * CR2 + (i >> 1) * 8, 8)]
                drow = jnp.where((i & 1) == 1, raw >> 16, raw) & 0xFFFF
                if cfg.far and m == cfg.nmaps - 1:
                    # FAR map: raw is distance - (far_dist-1) (phase 1)
                    drow = jnp.where(drow > 0, drow + cfg.far_dist - 1, 0)
                dr.append(drow)
                vu = (drow > 0) if vu is None else (vu | (drow > 0))
            drows.append(dr)
            valids.append(vu)

        gst = list(st[3:])
        for g in range(il):                  # pending needs one check
            gst[g * NST + 4] = gst[g * NST + 1]

        def w_cond(stt):
            it = stt[0]
            c = None
            for g in range(il):
                cur, pend = stt[3 + g * NST], stt[3 + g * NST + 1]
                pchk = stt[3 + g * NST + 4]
                av = valids[g] & (p >= cur)
                work = ((pend > 0) & (pchk > 0)) | ((pend == 0) & av)
                v = jnp.any(work)
                c = v if c is None else (c | v)
            return c & (it < nseg * 34)

        def group_step(g, cur, pend, ps, pd, pchk):
            dmaps, valid = drows[g], valids[g]
            drow = dmaps[0]
            w8c, limv = w8cs[g], limvs[g]

            av = valid & (p >= cur)
            m999 = jnp.where(av, lanes, 999)
            sidx = jnp.broadcast_to(
                jnp.min(m999, axis=1, keepdims=True), (8, 128))
            has = sidx < 999
            s_new = X0 + sidx
            d_new = _take(drow, jnp.clip(sidx, 0, 127))

            ap = (pend > 0) & (pchk > 0)        # pending check
            aq = (pend == 0) & has              # acquisition
            active = ap | aq
            s_tok = jnp.where(ap, ps, s_new)
            d_tok = jnp.where(ap, pd, d_new)
            rel0 = jnp.where(ap, 0, sidx)
            # the union lane may lack a map-0 candidate: the primary
            # evaluation must not treat d=0 as a (trivially surviving)
            # match — another map's candidate takes over in the pick
            act0 = ap | (aq & (d_new > 0))

            def fetch(d_tok, active):
                """xor of the segment's words vs bytes at (p - d_tok)."""
                y = p - d_tok
                wi = y >> 2
                if _ENC_ABL == "chain":
                    # dynamic-reach chain (ablation variant): cost
                    # scales with the farthest offset
                    wt = wi >> 7
                    wtp = (wi + 1) >> 7
                    lo = z
                    hi = z
                    Ttop = i >> 2
                    for k in range(ENC_NEAR + 1):
                        t_un = Ttop - k
                        tc = jnp.maximum(t_un, 0)
                        tile = w32[pl.ds(g * WR + tc * 8, 8)]
                        glo = _take(tile, wi & 127)
                        ghi = _take(tile, (wi + 1) & 127)
                        lo = jnp.where(wt == t_un, glo, lo)
                        hi = jnp.where(wtp == t_un, ghi, hi)
                    dmax = jnp.max(jnp.where(active, d_tok, 0))
                    tmin = (X0 - dmax) >> 9
                    kfar = jnp.maximum((Ttop - tmin) - ENC_NEAR, 0)

                    def far(q, lh):
                        lo, hi = lh
                        t_un = Ttop - (ENC_NEAR + 1) - q
                        tc = jnp.maximum(t_un, 0)
                        tile = w32[pl.ds(g * WR + tc * 8, 8)]
                        glo = _take(tile, wi & 127)
                        ghi = _take(tile, (wi + 1) & 127)
                        return (jnp.where(wt == t_un, glo, lo),
                                jnp.where(wtp == t_un, ghi, hi))

                    lo, hi = jax.lax.fori_loop(0, kfar, far, (lo, hi))
                else:
                    # constant-cost per-sublane fetch: each sublane's
                    # 128 source bytes span <= 2 word tiles. The tile
                    # index must be a SCALAR (dynamic row slice), but 8
                    # separate lane-0 extracts cost 8 vector->scalar
                    # syncs; instead compute everything vectorized and
                    # collapse the 8 tile indices into TWO packed
                    # scalars (4 bytes each, the decode refill's pks
                    # idiom), then unpack with cheap scalar shifts.
                    d0 = jnp.broadcast_to(
                        jax.lax.slice(d_tok, (0, 0), (8, 1)), (8, 128))
                    y0 = X0 - d0
                    y0c = jnp.maximum(y0, 0)
                    t0v = jnp.clip(y0c >> 9, 0, cfg.wtiles - 1)
                    # rel = word(y0+l) - t0*128, exact for lanes with
                    # y0+l >= 0 (the only ones the masks read);
                    # negative-y lanes floor below 0 -> garbage
                    rel_all = ((y0c >> 2) - t0v * 128 +
                               ((y0c & 3) + lanes + jnp.minimum(y0, 0))
                               // 4)
                    lane0 = lanes == 0
                    shb = (sub & 3) << 3
                    t0sh = _shl(t0v.astype(jnp.uint32),
                                shb).astype(jnp.int32)
                    pk_lo = jnp.sum(jnp.where(lane0 & (sub < 4), t0sh, 0))
                    pk_hi = jnp.sum(jnp.where(lane0 & (sub >= 4), t0sh, 0))
                    lo = z
                    hi = z
                    for b in range(8):
                        pk = pk_lo if b < 4 else pk_hi
                        t0s = (pk >> ((b & 3) * 8)) & 255
                        # Mosaic's dynamic_gather only lowers on full
                        # (8,128) tiles (a (1,128) gather fails shape
                        # checks) -> broadcast the row reads to 8
                        # sublanes before gathering
                        rA = jnp.broadcast_to(
                            w32[pl.ds(g * WR + t0s * 8 + b, 1)],
                            (8, 128))
                        rB = jnp.broadcast_to(
                            w32[pl.ds(g * WR
                                      + jnp.minimum(t0s + 1, cfg.wtiles)
                                      * 8 + b, 1)], (8, 128))
                        rel = jnp.broadcast_to(
                            jax.lax.slice(rel_all, (b, 0), (b + 1, 128)),
                            (8, 128))
                        gA = _take(rA, jnp.clip(rel, 0, 127))
                        gB = _take(rB, jnp.clip(rel - 128, 0, 127))
                        sl = jnp.where(rel < 128, gA, gB)
                        relh = rel + 1
                        gA2 = _take(rA, jnp.clip(relh, 0, 127))
                        gB2 = _take(rB, jnp.clip(relh - 128, 0, 127))
                        sh_ = jnp.where(relh < 128, gA2, gB2)
                        lo = jnp.where(sub == b, sl, lo)
                        hi = jnp.where(sub == b, sh_, hi)
                shs = (y & 3) << 3
                w8s = (_shr(lo.astype(jnp.uint32), shs)
                       | jnp.where(shs == 0, jnp.uint32(0),
                                   _shl(hi.astype(jnp.uint32),
                                        (32 - shs) & 31)))
                return (w8c ^ w8s).astype(jnp.int32)

            def evalcand(xor, s_t, rel_t, act):
                mm = (xor != 0) | (p >= limv)
                xm = mm & (lanes >= rel_t) & act
                xim = jnp.where(xm, lanes, 999)
                xi = jnp.broadcast_to(
                    jnp.min(xim, axis=1, keepdims=True), (8, 128))
                xv = _take(xor, jnp.clip(xi, 0, 127))
                tz = jnp.where((xv & 0xFF) != 0, 0,
                               jnp.where((xv & 0xFFFF) != 0, 1,
                                         jnp.where((xv & 0xFFFFFF) != 0,
                                                   2, 3)))
                ml = jnp.minimum((X0 + xi) - s_t + tz, limv - s_t)
                surv = act & (xi >= 999)
                return xi, ml, surv

            xor = fetch(d_tok, act0)
            xi, ml, survived = evalcand(xor, s_tok, rel0, act0)

            if cfg.nmaps > 1:
                # candidate pick across the k5-chain maps: extend every
                # verified candidate at s, keep the strictly longest
                # kernel-VISIBLE length (segment survivors compete with
                # their guaranteed lower bound; earlier map wins ties)
                v = jnp.where(survived, (128 - rel0) + 3,
                              jnp.where(act0, ml, -1))
                for m in range(1, cfg.nmaps):
                    d_m = _take(dmaps[m], jnp.clip(sidx, 0, 127))
                    act_m = aq & (d_m > 0)
                    xor_m = fetch(d_m, act_m)
                    xi_m, ml_m, surv_m = evalcand(xor_m, s_new, sidx,
                                                  act_m)
                    v_m = jnp.where(surv_m, (128 - sidx) + 3,
                                    jnp.where(act_m, ml_m, -1))
                    tk = v_m > v
                    if cfg.far and m == cfg.nmaps - 1:
                        # format rule: offsets >= 64K need ml >= 16
                        # (MM_LONGOFF); survivors qualify only when
                        # their guaranteed bound already clears it
                        tk = tk & jnp.where(surv_m, (128 - sidx) + 3
                                            >= 16, ml_m >= 16)
                    d_tok = jnp.where(tk, d_m, d_tok)
                    xor = jnp.where(tk, xor_m, xor)
                    xi = jnp.where(tk, xi_m, xi)
                    ml = jnp.where(tk, ml_m, ml)
                    survived = (tk & surv_m) | (~tk & survived)
                    v = jnp.where(tk, v_m, v)

            # lazy look-ahead (the fast parser's retry,
            # lizard_parser_fast.h:146-181 analog): positions
            # sidx+1..sidx+steps are evaluated across all maps; a later
            # candidate takes over iff its kernel-visible length beats
            # the current one's by more than the literal gap it skips
            # (segment survivors compete with their guaranteed bound)
            if cfg.nmaps > 1:
                vcur = v           # tracked through the candidate pick
            else:
                vcur = jnp.where(survived, (128 - rel0) + 3,
                                 jnp.where(act0, ml, -1))
            for step in range(1, int(cfg.lazy) + 1):
                rel2 = jnp.minimum(sidx + step, 127)
                s2 = X0 + rel2
                okstep = aq & (sidx < 128 - step)
                d2 = _take(drow, rel2)
                has2 = okstep & (d2 > 0)
                xor2 = fetch(d2, has2)
                xi2, ml2, surv2 = evalcand(xor2, s2, rel2, has2)
                v2 = jnp.where(surv2, (128 - rel2) + 3,
                               jnp.where(has2, ml2, -1))
                for m in range(1, cfg.nmaps):
                    d_m = _take(dmaps[m], rel2)
                    act_m = okstep & (d_m > 0)
                    xor_m = fetch(d_m, act_m)
                    xi_m, ml_m, surv_m = evalcand(xor_m, s2, rel2,
                                                  act_m)
                    v_m = jnp.where(surv_m, (128 - rel2) + 3,
                                    jnp.where(act_m, ml_m, -1))
                    tk = v_m > v2
                    if cfg.far and m == cfg.nmaps - 1:
                        tk = tk & jnp.where(surv_m, (128 - rel2) + 3
                                            >= 16, ml_m >= 16)
                        act_m = act_m & jnp.where(
                            surv_m, (128 - rel2) + 3 >= 16, ml_m >= 16)
                    d2 = jnp.where(tk, d_m, d2)
                    has2 = has2 | act_m
                    xor2 = jnp.where(tk, xor_m, xor2)
                    xi2 = jnp.where(tk, xi_m, xi2)
                    ml2 = jnp.where(tk, ml_m, ml2)
                    surv2 = (tk & surv_m) | (~tk & surv2)
                    v2 = jnp.where(tk, v_m, v2)
                take2 = has2 & (v2 > vcur + (rel2 - rel0))
                s_tok = jnp.where(take2, s2, s_tok)
                d_tok = jnp.where(take2, d2, d_tok)
                rel0 = jnp.where(take2, rel2, rel0)
                xor = jnp.where(take2, xor2, xor)
                xi = jnp.where(take2, xi2, xi)
                ml = jnp.where(take2, ml2, ml)
                survived = ((take2 & surv2)
                            | (~take2 & survived))
                vcur = jnp.where(take2, v2, vcur)

            # a lane whose only candidate(s) failed their gates (far map
            # ml < MM_LONGOFF) acquires nothing: skip the position, else
            # the while-loop would re-select it forever
            nofit = aq & (vcur < 0)
            found = active & ~survived & ~nofit

            # back-extension (lizard_parser_fast.h:102): consecutive
            # byte-equal lanes immediately below the match start,
            # floored at the anchor, window base, and segment start
            bmin = jnp.maximum(jnp.maximum(cur - X0, d_tok - X0), 0)
            blocker = (((xor & 255) != 0) | (lanes < bmin)) \
                & (lanes < rel0)
            bidx = jnp.broadcast_to(
                jnp.max(jnp.where(blocker, lanes, -1), axis=1,
                        keepdims=True), (8, 128))
            back = jnp.where(aq, jnp.maximum(rel0 - jnp.maximum(
                bidx + 1, bmin), 0), 0)
            s_tok = s_tok - back
            ml = ml + back

            cur = jnp.where(found, s_tok + ml,
                            jnp.where(nofit, s_new + 1, cur))
            pend = jnp.where(found, 0,
                             jnp.where(survived, 1,
                                       pend)).astype(jnp.int32)
            ps = jnp.where(survived, s_tok, ps)
            pd = jnp.where(survived, d_tok, pd)
            pchk = jnp.where(active, 0, pchk)

            fz = found.astype(jnp.int32)
            tok3 = (jnp.where(lanes == 0, s_tok,
                              jnp.where(lanes == 1, ml,
                                        jnp.where(lanes == 2, d_tok, 0)))
                    * fz)
            return cur, pend, ps, pd, pchk, tok3

        def w_body(stt):
            it, slot, row = stt[0], stt[1], stt[2]
            out = list(stt[3:])
            for g in range(il):
                cur, pend, ps, pd, pchk = stt[3 + g * NST:
                                              3 + (g + 1) * NST]
                cur, pend, ps, pd, pchk, tok3 = group_step(
                    g, cur, pend, ps, pd, pchk)
                out[g * NST:(g + 1) * NST] = [cur, pend, ps, pd, pchk]
                rolled = pltpu.roll(tok3, slot * 3, 1)
                acc = jnp.where(slot == 0, rolled,
                                out[il * NST + g] | rolled)
                tok[pl.ds(g * TR
                          + jnp.minimum(row, MAXROWS - 1) * 8, 8)] = acc
                out[il * NST + g] = acc
            wrap = slot == TPR - 1
            return (it + 1, jnp.where(wrap, 0, slot + 1),
                    row + wrap.astype(jnp.int32)) + tuple(out)

        stt = (st[0], st[1], st[2]) + tuple(gst)
        if _ENC_UNR > 1:
            # run _ENC_UNR bodies per while condition: the w_cond scalar
            # sync is a large share of pass-A time (NOTES_ROUND4), and a
            # workless body is a masked no-op that only burns one null
            # token slot (tok_rows carries the headroom)
            def w_bodyU(s):
                for _ in range(_ENC_UNR):
                    s = w_body(s)
                return s
            stt = jax.lax.while_loop(w_cond, w_bodyU, stt)
        else:
            stt = jax.lax.while_loop(w_cond, w_body, stt)
        return stt

    init = ((jnp.int32(0), jnp.int32(0), jnp.int32(0))
            + tuple(z for _ in range(NST * il))
            + tuple(z for _ in range(il)))
    st = jax.lax.fori_loop(0, nseg, seg_body, init)
    it_fin = st[0]
    for g in range(il):
        tok[pl.ds((g * TR + MAXROWS * 8), 8)] = jnp.full(
            (8, 128), it_fin, jnp.int32)

    cp_out = pltpu.make_async_copy(tok, tok_hbm, sems.at[2])
    cp_out.start()
    cp_out.wait()


def unpack_d16(packed, cfg: EncCfg, m=0):
    """Host: p1_call output -> (8, n) int64 match-distance map m."""
    CR2 = cfg.nseg // 2 * 8
    pk = np.asarray(packed)[m * CR2:(m + 1) * CR2].reshape(
        cfg.nseg // 2, 8, 128)
    d = np.empty((cfg.nseg, 8, 128), np.int64)
    d[0::2] = pk & 0xFFFF
    d[1::2] = (pk >> 16) & 0xFFFF
    return d.transpose(1, 0, 2).reshape(8, cfg.n)


class TokenOverflow(Exception):
    """Pass A emitted more iterations than the token buffer holds
    (pathological token density); the caller must fall back."""


def _maxrows(cfg):
    # worst case: 32 matches (ml >= 4) + 1 pending check per segment;
    # cfg.tok_rows caps the buffer (VMEM/DMA) — overflow falls back
    return min(cfg.tok_rows, (cfg.nseg * 33 + TPR - 1) // TPR)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "il"))
def pA_call(w32i, cand_packed, meta, cfg: EncCfg, interpret=False, il=1):
    """w32i from pack_blocks; cand_packed from p1_call (d16-packed) —
    for il > 1 both are row-stacked per group and meta is (il*8,).
    Returns tok (il*(MAXROWS+1)*8, 128) i32, row-stacked per group:
    within a group, row r lane 3k..3k+2 = (s, ml, d) of iteration
    r*TPR+k (ml=0 null); the group's final tile = total iteration
    count (> MAXROWS*TPR means the buffer overflowed and tokens were
    dropped — callers must fall back, see TokenOverflow)."""
    MAXROWS = _maxrows(cfg)
    kernel = functools.partial(_pA_kernel, cfg, MAXROWS, il)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((il * (cfg.wtiles + 1) * 8, 128), jnp.int32),
            pltpu.VMEM((il * cfg.nmaps * (cfg.nseg // 2) * 8, 128),
                       jnp.int32),
            pltpu.VMEM((il * (MAXROWS + 1) * 8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((il * (MAXROWS + 1) * 8, 128),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, w32i, cand_packed)


def unpack_tokens(tok, cfg: EncCfg):
    """Host: tok array from pA_call -> per-block token lists
    [(s, ml, d), ...] in parse order."""
    MAXROWS = _maxrows(cfg)
    tok = np.asarray(tok)
    it_fin = int(tok[MAXROWS * 8, 0])
    if it_fin > MAXROWS * TPR:
        raise TokenOverflow(it_fin)
    rows = min((it_fin + TPR - 1) // TPR, MAXROWS)
    body = tok[:rows * 8].reshape(rows, 8, 128)
    out = [[] for _ in range(8)]
    k3 = np.arange(TPR) * 3
    s_all = body[:, :, k3]            # (rows, 8, TPR)
    ml_all = body[:, :, k3 + 1]
    d_all = body[:, :, k3 + 2]
    for b in range(8):
        sel = ml_all[:, b, :] > 0
        rs, ks = np.nonzero(sel)
        order = np.argsort(rs * TPR + ks, kind="stable")
        out[b] = list(zip(s_all[:, b, :][sel][order].tolist(),
                          ml_all[:, b, :][sel][order].tolist(),
                          d_all[:, b, :][sel][order].tolist()))
    return out


# ------------------------------------------------- pass B: emission (host)
#
# Token lists -> the fastLZ4 inner-block streams (flags + literal body,
# layout per lizard_compress_lz4.h:3-71, same container assembly as
# ops/encode_tpu.py). Fully vectorized numpy: every write position comes
# from a prefix sum over per-token stream sizes; literal runs copy via
# the repeat/gap method. ~O(output bytes) in C-speed passes.

RUN_MASK = 15
ML_MASK = 15


def _ext_sizes(v, present):
    """Byte count of a length-extension field (0 if not present)."""
    return np.where(present,
                    np.where(v < 254, 1, np.where(v < (1 << 16), 3, 4)), 0)


def emit_tokens(data: bytes, st, ml, off):
    """st/ml/off: int64 numpy arrays (parse order). Returns
    (flags u8 array, lits u8 array)."""
    n = len(data)
    src = np.frombuffer(data, np.uint8)
    nt = len(st)
    if nt == 0:
        return np.zeros(0, np.uint8), src.copy()
    ends = st + ml
    prev_end = np.empty(nt, np.int64)
    prev_end[0] = 0
    prev_end[1:] = ends[:-1]
    ll = st - prev_end
    mlx = ml - MINMATCH

    flags = (np.minimum(ll, RUN_MASK)
             | (np.minimum(mlx, ML_MASK) << 4)).astype(np.uint8)

    vll = ll - RUN_MASK
    vml = mlx - ML_MASK
    ell = _ext_sizes(vll, ll >= RUN_MASK)
    eml = _ext_sizes(vml, mlx >= ML_MASK)
    tsz = ell + ll + 2 + eml
    off_tok = np.zeros(nt + 1, np.int64)
    np.cumsum(tsz, out=off_tok[1:])
    tail_ll = n - ends[-1]
    out = np.zeros(off_tok[-1] + tail_ll, np.uint8)

    def put_ext(base, v, elen):
        has = elen >= 1
        b = base[has]
        vv = v[has]
        first = np.where(elen[has] == 1, vv,
                         np.where(elen[has] == 3, 254, 255))
        out[b] = first
        m3 = elen >= 3
        b3, v3 = base[m3], v[m3]
        out[b3 + 1] = v3 & 255
        out[b3 + 2] = (v3 >> 8) & 255
        m4 = elen == 4
        out[base[m4] + 3] = (v[m4] >> 16) & 255

    put_ext(off_tok[:-1], vll, ell)

    # literal runs: output [off_tok+ell, +ll) <- src[prev_end, +ll)
    tot_l = int(ll.sum())
    if tot_l:
        cum = np.zeros(nt, np.int64)
        np.cumsum(ll[:-1], out=cum[1:])
        ar = np.arange(tot_l, dtype=np.int64) - np.repeat(cum, ll)
        out[np.repeat(off_tok[:-1] + ell, ll) + ar] = \
            src[np.repeat(prev_end, ll) + ar]

    opos = off_tok[:-1] + ell + ll
    out[opos] = off & 255
    out[opos + 1] = (off >> 8) & 255
    put_ext(opos + 2, vml, eml)

    if tail_ll:
        out[off_tok[-1]:] = src[ends[-1]:]
    return flags, out


MAX_SHORT_LITLEN = 7           # LIZv1 token fields (lizard_common.h)
MAX_SHORT_MATCHLEN = 15
RUN_BITS_LIZ = 3


def _emit_tokens_liz_scalar(data: bytes, st, ml, off):
    """Scalar LIZv1 emitter covering the FULL codeword set including the
    off24 class (lizard_compress_liz.h:43-165, 92-136): offsets >= 64K
    emit the long-match token family (literals ride a zero-length rep
    token first; ml' = ml - MM_LONGOFF; token 31 + ext above 46) into
    the off24 stream. Used for token lists containing far offsets; the
    vectorized path below handles the common all-near case."""
    from lizard_tpu.format.constants import MM_LONGOFF as _MM
    src = np.frombuffer(data, np.uint8)
    flags = bytearray()
    lits = bytearray()
    o16 = bytearray()
    o24 = bytearray()
    last_off = 0
    anchor = 0

    def put_ext(v):
        if v < 254:
            lits.append(v)
        elif v < 65536:
            lits.extend((254, v & 255, (v >> 8) & 255))
        else:
            lits.extend((255, v & 255, (v >> 8) & 255, (v >> 16) & 255))

    for s, m, d in zip(st, ml, off):
        s, m, d = int(s), int(m), int(d)
        ll = s - anchor
        rep = last_off != 0 and d == last_off
        tok = len(flags)
        flags.append(0)
        if ll > 0 or (d < 65536 or rep):
            if ll >= MAX_SHORT_LITLEN:
                flags[tok] = MAX_SHORT_LITLEN
                put_ext(ll - MAX_SHORT_LITLEN)
            else:
                flags[tok] = ll
            lits += src[anchor:s].tobytes()
            if d >= 65536 and not rep:
                flags[tok] += 128          # literal-carrier rep token
                tok = len(flags)
                flags.append(0)
        if d >= 65536 and not rep:
            assert m >= _MM
            if m - _MM >= 31:
                flags[tok] = 31
                put_ext(m - _MM - 31)
            else:
                flags[tok] = m - _MM
            o24 += d.to_bytes(3, "little")
            last_off = d
        else:
            if rep:
                flags[tok] += 128
            else:
                last_off = d
                o16 += d.to_bytes(2, "little")
            if m >= MAX_SHORT_MATCHLEN:
                flags[tok] += MAX_SHORT_MATCHLEN << RUN_BITS_LIZ
                put_ext(m - MAX_SHORT_MATCHLEN)
            else:
                flags[tok] += m << RUN_BITS_LIZ
        anchor = s + m
    lits += src[anchor:].tobytes()
    return (np.frombuffer(bytes(flags), np.uint8),
            np.frombuffer(bytes(lits), np.uint8),
            np.frombuffer(bytes(o16), np.uint8),
            np.frombuffer(bytes(o24), np.uint8))


def emit_tokens_liz(data: bytes, st, ml, off):
    """LIZv1 serialization of a token list (lizard_compress_liz.h:43-165).
    Tokens repeating the previous offset use the rep class (bit 7, zero
    offset bytes — last_off carries, so runs of equal offsets all
    collapse); offsets >= 64K take the off24 long-match class (scalar
    path). Returns (flags, lits, off16, off24) uint8 arrays; length
    extensions ride the literals stream."""
    n = len(data)
    src = np.frombuffer(data, np.uint8)
    nt = len(st)
    z8 = np.zeros(0, np.uint8)
    if nt == 0:
        return (z8, src.copy(), z8, z8)
    st = np.asarray(st)
    ml = np.asarray(ml)
    off = np.asarray(off)
    if (off >= 65536).any():
        return _emit_tokens_liz_scalar(data, st, ml, off)
    ends = st + ml
    prev_end = np.empty(nt, np.int64)
    prev_end[0] = 0
    prev_end[1:] = ends[:-1]
    ll = st - prev_end

    rep = np.zeros(nt, bool)
    rep[1:] = off[1:] == off[:-1]        # last_off persists across reps

    flags = (np.minimum(ll, MAX_SHORT_LITLEN)
             | (np.minimum(ml, MAX_SHORT_MATCHLEN) << RUN_BITS_LIZ)
             | (rep << (RUN_BITS_LIZ + 4))).astype(np.uint8)

    vll = ll - MAX_SHORT_LITLEN
    vml = ml - MAX_SHORT_MATCHLEN
    ell = _ext_sizes(vll, ll >= MAX_SHORT_LITLEN)
    eml = _ext_sizes(vml, ml >= MAX_SHORT_MATCHLEN)
    tsz = ell + ll + eml
    off_tok = np.zeros(nt + 1, np.int64)
    np.cumsum(tsz, out=off_tok[1:])
    tail_ll = n - ends[-1]
    out = np.zeros(off_tok[-1] + tail_ll, np.uint8)

    def put_ext(base, v, elen):
        has = elen >= 1
        b = base[has]
        vv = v[has]
        first = np.where(elen[has] == 1, vv,
                         np.where(elen[has] == 3, 254, 255))
        out[b] = first
        m3 = elen >= 3
        b3, v3 = base[m3], v[m3]
        out[b3 + 1] = v3 & 255
        out[b3 + 2] = (v3 >> 8) & 255
        m4 = elen == 4
        out[base[m4] + 3] = (v[m4] >> 16) & 255

    put_ext(off_tok[:-1], vll, ell)
    tot_l = int(ll.sum())
    if tot_l:
        cum = np.zeros(nt, np.int64)
        np.cumsum(ll[:-1], out=cum[1:])
        ar = np.arange(tot_l, dtype=np.int64) - np.repeat(cum, ll)
        out[np.repeat(off_tok[:-1] + ell, ll) + ar] = \
            src[np.repeat(prev_end, ll) + ar]
    put_ext(off_tok[:-1] + ell + ll, vml, eml)
    if tail_ll:
        out[off_tok[-1]:] = src[ends[-1]:]

    offs = off[~rep]
    off16 = np.empty(len(offs) * 2, np.uint8)
    off16[0::2] = offs & 255
    off16[1::2] = (offs >> 8) & 255
    return flags, out, off16, np.zeros(0, np.uint8)


def assemble_block(data, flags, lits, off16=b"", huff=False, off24=b""):
    """Inner-block container (Lizard_writeBlock + Lizard_writeStream,
    lizard_compress.c:141-250): header byte of per-stream huff bits,
    streams in lens/off16/off24/flags/literals order, Huffman applied
    to flags+literals when huff=True and the reference's gain gates
    pass, uncompressed fallback on insufficient total gain."""
    from lizard_tpu.format.constants import (
        FLAG_UNCOMPRESSED, FLAG_FLAGS, FLAG_LITERALS, FLAG_OFFSET16,
        FLAG_OFFSET24, minimal_huff_gain, minimal_block_gain)

    def write_stream(out, stream, use_huff):
        if use_huff and len(stream) > 1024:
            if _os.environ.get("LIZARD_TPU_HUF") == "tpu":
                # TPU lane bit-packing (ops/enc_huf.py): byte-identical
                # to the native/python Huff0 encoders
                from lizard_tpu.ops.enc_huf import huf_compress_tpu
                comp = huf_compress_tpu(bytes(stream))
            else:
                from lizard_tpu import runtime
                comp = runtime.huf_compress(bytes(stream))
            if (comp is not None and len(comp) > 0
                    and minimal_huff_gain(len(comp)) < len(stream)):
                out += len(stream).to_bytes(3, "little")
                out += len(comp).to_bytes(3, "little")
                out += comp
                return 1
        out += len(stream).to_bytes(3, "little")
        out += bytes(stream)
        return 0

    body = bytearray()
    body.append(0)
    write_stream(body, b"", False)                    # lens: empty
    body[0] += write_stream(body, bytes(off16), False) * FLAG_OFFSET16
    body[0] += write_stream(body, bytes(off24), False) * FLAG_OFFSET24
    body[0] += write_stream(body, bytes(flags), huff) * FLAG_FLAGS
    body[0] += write_stream(body, bytes(lits), huff) * FLAG_LITERALS
    sum_len = len(flags) + len(lits) + len(off16) + len(off24)
    if (len(lits) < 16 or sum_len + 5 * 3 + 1 > len(data)
            or minimal_block_gain(len(body)) > len(data)):
        out = bytearray([FLAG_UNCOMPRESSED])
        out += len(data).to_bytes(3, "little")
        out += data
        return bytes(out)
    return bytes(body)


def _minimal_block_gain(comp_len):
    from lizard_tpu.format.constants import minimal_block_gain
    return minimal_block_gain(comp_len)


def unpack_token_arrays(tok, cfg: EncCfg):
    """Host: tok array from pA_call -> 8 (st, ml, d) int64 array triples
    in parse order."""
    MAXROWS = _maxrows(cfg)
    tok = np.asarray(tok)
    it_fin = int(tok[MAXROWS * 8, 0])
    if it_fin > MAXROWS * TPR:
        raise TokenOverflow(it_fin)
    rows = min((it_fin + TPR - 1) // TPR, MAXROWS)
    body = tok[:rows * 8].reshape(rows, 8, 128)
    k3 = np.arange(TPR) * 3
    # slot (row, k) = iteration row*TPR+k: row-major order IS parse order
    s_all = body[:, :, k3].astype(np.int64)
    ml_all = body[:, :, k3 + 1].astype(np.int64)
    d_all = body[:, :, k3 + 2].astype(np.int64)
    res = []
    for b in range(8):
        sel = ml_all[:, b, :] > 0
        res.append((s_all[:, b, :][sel], ml_all[:, b, :][sel],
                    d_all[:, b, :][sel]))
    return res


def cfg_for_level(level: int) -> EncCfg:
    """Level-mapped encoder geometry. Level 10 mirrors the reference's
    small fast table; 11+ use the full 16-bit offset reach (measured
    +35% ratio on the bench corpus; the dynamic-reach chains keep the
    verify/extension cost proportional to offsets actually used).
    x6..x9 are the hash-chain tiers (phase 1.5 prewalk): depth, hash
    width and ranking depth rise together — 16 MB bench-mirror ratios
    0.5190 / 0.5147 / 0.5068 / 0.5039 vs the reference ladder -14
    0.5309, -17 0.4930 (their -17 also has a 2x bigger window)."""
    sub = level % 10
    # LIZv1 families get the off24 class (within-block 64-128 KB reach,
    # MM_LONGOFF>=16) via the delayed far table; chain tiers (6-9) keep
    # far off (phase 1.5's map layout owns the last slot)
    far = 1 if (level // 10) in (2, 4) and sub <= 5 else 0
    if sub == 0:
        # greedy single-table with the full 16-bit reach: measured
        # 0.5720 on the bench corpus vs the reference -10's 0.5791 —
        # the 16 KB-reach variant (0.5832) would trail it
        return EncCfg(maxoff=65535, far=far)
    if sub == 1:
        return EncCfg(maxoff=65535, lazy=1, far=far)
    if sub == 2:
        return EncCfg(maxoff=65535, lazy=1, k5=1, far=far)
    if sub <= 4:
        return EncCfg(maxoff=65535, lazy=2, k5=2, far=far)
    if sub == 5:
        return EncCfg(maxoff=65535, lazy=2, k5=4, far=far)
    if sub == 6:
        return EncCfg(maxoff=65535, lazy=2, chain=16, hl=15)
    if sub == 7:
        return EncCfg(maxoff=65535, lazy=2, chain=16, hl=15, pref=16)
    if sub == 8:
        return EncCfg(maxoff=65535, lazy=2, chain=32, hl=16, pref=16)
    return EncCfg(maxoff=65535, lazy=2, chain=64, hl=16, pref=16)


def encode_blocks_lanes(blocks, level=10, cfg: EncCfg = None,
                        interpret=None, il=1):
    """Compress up-to-128 KB blocks with the Pallas lane pipeline
    (p1 match finder + pass-A parse on device, emission on host).
    All four level families: 10-19 fastLZ4, 20-29 LIZv1, 30-39
    fastLZ4+Huffman, 40-49 LIZv1+Huffman (same parse; the entropy stage
    runs through the native Huff0 encoder on host). LIZv1 families use
    the full codeword set including the off24 class (cfg.far: delayed
    far table, within-block 64-128 KB reach, MM_LONGOFF enforced);
    reach beyond one block still trades ratio against the reference's
    multi-MB window. Returns one container stream (level byte + inner
    block) per input, decodable by liblizard and this repo's
    decoders."""
    import jax
    import jax.numpy as jnp
    if cfg is None:
        cfg = cfg_for_level(level)
    if interpret is None:      # Pallas needs a real TPU; CPU interprets
        interpret = jax.default_backend() == "cpu"
    for d in blocks:
        if len(d) > cfg.n:
            raise ValueError("encode_blocks_lanes: block > cfg.n")
    res = [None] * len(blocks)
    # dispatch every group first (jax dispatch is async): device compute
    # for group k+1.. overlaps the host emission of group k
    jobs = []
    TR = (_maxrows(cfg) + 1) * 8
    import dataclasses
    pa_cfg = dataclasses.replace(cfg, chain=0) if cfg.chain else cfg
    for base in range(0, len(blocks), 8 * il):
        part = blocks[base:base + 8 * il]
        subs = [part[k * 8:(k + 1) * 8] for k in range(il)]
        packs = [pack_blocks(sg, cfg) for sg in subs]
        p1s = [p1_call(jnp.asarray(w), jnp.asarray(m), cfg,
                       interpret=interpret) for (w, m) in packs]
        if cfg.chain:          # phase 1.5: fold the walk into map 0
            p1s = [p15_call(jnp.asarray(w), pk, jnp.asarray(m), cfg,
                            interpret=interpret)
                   for (w, m), pk in zip(packs, p1s)]
        w32j = jnp.asarray(np.concatenate([w for w, _ in packs], axis=0))
        metaj = jnp.asarray(np.concatenate([m for _, m in packs]))
        cands = jnp.concatenate(p1s, axis=0) if il > 1 else p1s[0]
        jobs.append((base, part,
                     pA_call(w32j, cands, metaj, pa_cfg,
                             interpret=interpret, il=il)))
    for base, part, tok in jobs:
        try:
            tok = np.asarray(tok)
            arrs = []
            for g in range((len(part) + 7) // 8):
                arrs.extend(unpack_token_arrays(
                    tok[g * TR:(g + 1) * TR], cfg))
        except TokenOverflow:
            # pathological token density blew the capped buffer: this
            # group re-encodes through the host fallback
            for k, d in enumerate(part):
                res[base + k] = _fallback_inner(d, level)
            continue
        except Exception:
            if interpret:
                raise              # tests must see real failures
            # device-side failure (e.g. VMEM pressure at a deep tier):
            # keep the compression call alive via the host fallback
            for k, d in enumerate(part):
                res[base + k] = _fallback_inner(d, level)
            continue
        for k, d in enumerate(part):
            st, ml, off = arrs[k]
            res[base + k] = emit_inner(d, st, ml, off, level)
    return [bytes([level]) + b for b in res]


def emit_inner(d, st, ml, off, level):
    """Pass B for one block: serialize a token list into the level's
    codeword family (+ Huff0 stage for 30-49). Returns the inner block
    (no level byte). The token loop runs through the native runtime
    when available (~10x the numpy scatter path, whose np.repeat
    literal copy moves 24 index bytes per literal byte); both emit
    byte-identical streams (tests/test_native_runtime.py)."""
    from lizard_tpu import runtime
    fam = level // 10
    if fam in (2, 4):                          # LIZv1 codewords
        offa = np.asarray(off)
        if len(offa) and int(offa.max(initial=0)) >= 65536:
            # off24 class present: full-codeword emitters
            r = runtime.emit_liz_far(d, st, ml, off)
            if r is None:
                r = _emit_tokens_liz_scalar(d, st, ml, off)
            flags, lits, off16, off24 = r
        else:
            r = runtime.emit_liz(d, st, ml, off)
            if r is None:
                r = emit_tokens_liz(d, st, ml, off)[:3]
            flags, lits, off16 = r
            off24 = b""
        return assemble_block(d, flags, lits, off16, huff=(fam == 4),
                              off24=off24)
    r = runtime.emit_lz4(d, st, ml, off)       # fastLZ4 codewords
    if r is None:
        r = emit_tokens(d, st, ml, off)
    flags, lits = r
    return assemble_block(d, flags, lits, b"", huff=(fam == 3))


def _fallback_inner(d, level):
    """One inner block via the native encoder (or, when the native
    runtime is unavailable, the XLA pipeline / scalar oracle)."""
    try:
        from lizard_tpu import runtime
        return runtime.compress(d, level)[1:]
    except Exception:
        if level >= 20:
            from lizard_tpu.ref.block_encode import compress
            return compress(d, level)[1:]
        from lizard_tpu.ops.encode_tpu import encode_blocks_tpu
        return encode_blocks_tpu([d], level=level)[0][1:]


def encode_streams_lanes(datas, level=10, cfg: EncCfg = None,
                         interpret=None):
    """Compress arbitrary-size buffers: level byte + independent
    cfg.n-sized inner blocks (same chunking contract as
    ops/encode_tpu.py encode_streams_tpu)."""
    if cfg is None:
        cfg = cfg_for_level(level)
    chunks = []
    spans = []
    for d in datas:
        s0 = len(chunks)
        for i in range(0, len(d), cfg.n):
            chunks.append(d[i:i + cfg.n])
        if len(d) == 0:
            chunks.append(b"")
        spans.append((s0, len(chunks)))
    inner = encode_blocks_lanes(chunks, level=level, cfg=cfg,
                                interpret=interpret)
    body = [b[1:] for b in inner]          # strip the per-chunk level byte
    return [bytes([level]) + b"".join(body[a:b]) for a, b in spans]


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


def p2_reference(blocks, cfg: EncCfg, dmap=None):
    """Numpy mirror of pass A (the parse): greedy with EXACT per-token
    extension over the phase-1 candidate set, matching the reference
    fast parser's semantics (lib/lizard_parser_fast.h:41-196: acquire
    next match at/after the cursor, extend to first mismatching byte,
    jump the cursor past it). Returns per-block token lists
    [(s, ml, d), ...] with s strictly increasing, ml >= MINMATCH.

    Extension is word-exact the way the kernel computes it: first
    mismatching 4-byte word at byte granularity + trailing-zero bytes
    of the xor, clamped to lim = n - LASTLITERALS.

    chain > 0 runs phase 1.5 first (p15_reference: the vectorized
    prefix-ranked hash-chain walk replaces map 0 and consumes the
    delta map); the parse itself is always chain-free."""
    if dmap is None:
        dmap, _ = p1_reference(blocks, cfg)
    if cfg.chain:
        import dataclasses
        dmap = p15_reference(blocks, cfg, dmap)
        cfg = dataclasses.replace(cfg, chain=0)
    out = []
    for b, data in enumerate(blocks):
        n = len(data)
        toks = []
        if n >= LIZARD_MIN_LENGTH:
            u8 = np.zeros(cfg.n + 4, np.uint8)
            u8[:n] = np.frombuffer(data, np.uint8)
            w8 = (u8[:cfg.n].astype(np.uint32)
                  | u8[1:cfg.n + 1].astype(np.uint32) << 8
                  | u8[2:cfg.n + 2].astype(np.uint32) << 16
                  | u8[3:cfg.n + 3].astype(np.uint32) << 24)
            db = dmap[b]
            if cfg.nmaps == 1:
                db = db[None, :]
            anyc = (db > 0).any(axis=0)
            cpos = np.flatnonzero(anyc)
            lim = n - LASTLITERALS
            cur = 0
            ci = 0

            def mismatch_x(s, d):
                # first x in [s, lim) with a w8 word mismatch (lim if
                # none -- the kernel's forced mismatch)
                x = s
                win = 128
                while x < lim:
                    e = min(x + win, lim)
                    neq = np.flatnonzero(w8[x:e] != w8[x - d:e - d])
                    if neq.size:
                        return x + int(neq[0])
                    x = e
                    win *= 4
                return lim

            def ml_of(s, x):
                return (lim - s) if x >= lim else min(x - s + 3, lim - s)

            far_idx = cfg.nmaps - 1 if cfg.far else -1

            def pick(s, seg_end):
                """Kernel candidate pick: strictly-longest VISIBLE
                length wins (segment survivors show seg_end-s+3; the
                earlier map wins ties). The far map's candidates carry
                +65535 and must clear MM_LONGOFF (survivors via their
                guaranteed bound). Returns (v, ml_full, d); v = -1 means
                no candidate fit (the parse skips the position)."""
                bv, bml, bd = -1, 0, 0
                for mi, row in enumerate(db):
                    if row[s] <= 0:
                        continue
                    d = int(row[s]) + (cfg.far_dist - 1
                                       if mi == far_idx else 0)
                    x = mismatch_x(s, d)
                    m = ml_of(s, x)
                    surv = x >= seg_end
                    v = (seg_end - s + 3) if surv else m
                    if mi == far_idx and v < 16:
                        continue
                    if v > bv:
                        bv, bml, bd = v, m, d
                return bv, bml, bd

            while ci < len(cpos):
                ci = np.searchsorted(cpos, cur)
                if ci >= len(cpos):
                    break
                s = int(cpos[ci])
                seg_end = (s // SEG) * SEG + SEG
                v1, ml, d = pick(s, seg_end)
                if v1 < 0:          # every candidate failed its gate
                    cur = s + 1
                    continue
                s0 = s
                for step in range(1, int(cfg.lazy) + 1):
                    # kernel lazy rule: kernel-VISIBLE lengths, later
                    # candidate must win by more than the skipped gap
                    if (s0 % SEG) < 128 - step and anyc[s0 + step]:
                        v2, ml2, d2 = pick(s0 + step, seg_end)
                        if v2 > v1 + (s0 + step - s):
                            s, d, ml, v1 = s0 + step, d2, ml2, v2
                # back-extension (lizard_parser_fast.h:102): byte-wise
                # while above the anchor and the window base; the lane
                # kernel additionally floors at the segment start
                floor = max(cur, d, (s // SEG) * SEG)
                bk = s
                while bk > floor and u8[bk - 1] == u8[bk - 1 - d]:
                    bk -= 1
                toks.append((bk, ml + (s - bk), d))
                cur = s + ml
        out.append(toks)
    return out


def p1_reference(blocks, cfg: EncCfg):
    """Bit-exact numpy mirror of the phase-1 kernel (the test oracle).
    Returns (maps, meta): maps has shape (8, n) when cfg.nmaps == 1,
    else (8, nmaps, n) — map 0 = h4+probes, maps 1..k5 = the rotating
    5-byte-hash slots. 0 = no candidate, else the match distance."""
    u8 = np.zeros((8, cfg.n), np.uint8)
    meta = np.zeros((8,), np.int64)
    for b, d in enumerate(blocks):
        u8[b, :len(d)] = np.frombuffer(d, np.uint8)
        meta[b] = len(d)
    nm = cfg.nmaps
    out = np.zeros((8, nm, cfg.n), np.int64)
    for b in range(8):
        n = meta[b]
        wpad = np.zeros(cfg.n + 4, np.uint8)
        wpad[:cfg.n] = u8[b]
        w8 = (wpad[:cfg.n].astype(np.uint32)
              | wpad[1:cfg.n + 1].astype(np.uint32) << 8
              | wpad[2:cfg.n + 2].astype(np.uint32) << 16
              | wpad[3:cfg.n + 3].astype(np.uint32) << 24)
        # kernel funnel: word W and W+1 with W+1 clamped to the last
        # word of the LAST TILE; only affects p >= n-3, masked anyway
        h = ((w8 * np.uint32(HMUL)) >> np.uint32(32 - cfg.hl)).astype(
            np.int64)
        k5 = cfg.k5
        if k5:
            b4 = wpad[4:cfg.n + 4].astype(np.uint32)     # byte at p+4
            h5v = (((w8 ^ (b4 * np.uint32(H5MIX))) * np.uint32(HMUL))
                   >> np.uint32(32 - cfg.hl)).astype(np.int64)
        t4 = np.zeros(1 << cfg.hl, np.int64)
        t5 = [np.zeros(1 << cfg.hl, np.int64) for _ in range(k5)]
        tF = np.zeros(1 << cfg.hl, np.int64) if cfg.far else None
        pos = np.arange(cfg.n)
        if cfg.far:
            # kernel _chk13 mirror (incl. the circular per-segment rolls)
            W = w8.reshape(cfg.nseg, SEG)
            mix = (W.astype(np.int32)
                   ^ (np.roll(W, -4, 1).astype(np.int32)
                      * np.int32(_CHK1))
                   ^ (np.roll(W, -8, 1).astype(np.int32)
                      * np.int32(_CHK2))
                   ^ (np.roll(W, -12, 1).astype(np.int32)
                      * np.int32(_CHK3)))
            chk_all = (((mix * np.int32(_HMULI)).astype(np.uint32)
                        >> np.uint32(19)) & 8191).astype(np.int64)
            chk_all = chk_all.reshape(cfg.n)
        emit = np.zeros((nm, cfg.n), np.int64)
        for i in range(cfg.nseg):
            seg = slice(i * SEG, (i + 1) * SEG)
            ps = pos[seg]

            def probe_tab(tab, h_t):
                v = tab[h_t[seg]]
                c0 = v - 1
                off = ps - c0
                ok = ((v > 0)
                      & (w8[np.clip(c0, 0, cfg.n - 1)] == w8[seg])
                      & (off >= cfg.min_offset) & (off <= cfg.maxoff))
                return ok, c0

            ok4, c4 = probe_tab(t4, h)
            best = np.where(ok4, c4, -1)
            for d in cfg.probes:
                c = ps - d
                ok = (best < 0) & (c >= 0) & (
                    w8[np.clip(c, 0, cfg.n - 1)] == w8[seg])
                best = np.where(ok, c, best)
            oks5 = [probe_tab(t5[j], h5v) for j in range(k5)]
            if k5 == 1:
                best = np.where(oks5[0][0], oks5[0][1], best)
                bests = [best]
            elif k5 >= 2:
                bests = [best] + [np.where(ok, c0, -1)
                                  for ok, c0 in oks5]
            else:
                bests = [best]
            emit_ok = (ps < n - MFLIMIT) & (n >= LIZARD_MIN_LENGTH)
            for m, bm in enumerate(bests):
                emit[m][seg] = np.where(emit_ok & (bm >= 0), ps - bm, 0)
            if cfg.far:
                # FAR map (raw = distance - (far_dist-1)): entry =
                # ((pos+1) << 13) | chk13 of the first 16 bytes; a
                # mismatching checksum drops the candidate (spurious
                # 4-byte hits never reach pass A)
                FD = cfg.far_dist
                vF = tF[h[seg]]
                jpos = (vF >> 13) - 1
                offF = ps - jpos
                okF = ((vF > 0) & ((vF & 8191) == chk_all[seg])
                       & (offF >= FD) & (offF <= 2 * FD - 2))
                emit[len(bests)][seg] = np.where(emit_ok & okF,
                                                 offF - (FD - 1), 0)
            # insert: adjacent dedupe (keep last of each run; lane 127
            # always kept), duplicates after dedupe keep the OLD entry;
            # the h5 tables take turns (rotating slot i mod k5)
            if cfg.chain:
                # DELTA map (last emit row): per-position distance to the
                # pre-segment h4-bucket occupant, UNVERIFIED and offset-
                # uncapped (0 = empty bucket or >= the d16 cap). Chain
                # nodes re-verify at walk time, so this enumerates the
                # bucket-occupant history like the reference's chainTable
                # (lib/lizard_parser_hashchain.h:13-43) at zero insert
                # cost: it falls out of the lookup the kernel already does.
                vh = t4[h[seg]]
                dl = ps - (vh - 1)
                emit[nm - 1][seg] = np.where(
                    (vh > 0) & (dl < (1 << 16)), dl, 0)
            ins = [(h[seg], ps, t4, None)]
            if k5:
                ins.append((h5v[seg], ps, t5[i & (k5 - 1)], None))
            if cfg.far and i >= cfg.far_dist // SEG:
                jf = i - cfg.far_dist // SEG
                segj = slice(jf * SEG, (jf + 1) * SEG)
                ins.append((h[segj], pos[segj], tF, chk_all))
            for hs, pv, tab, chkv in ins:
                keep = np.ones(SEG, bool)
                keep[:-1] = hs[:-1] != hs[1:]
                keep &= pv < n
                hk, pk = hs[keep], pv[keep]
                uniq, inv, cnt = np.unique(hk, return_inverse=True,
                                           return_counts=True)
                lastp = np.zeros(len(uniq), np.int64)
                lastp[inv] = pk                 # later writes win
                one = cnt == 1
                v = lastp[one] + 1
                if chkv is not None:
                    v = (v << 13) | chkv[lastp[one]]
                tab[uniq[one]] = v
        out[b] = emit
    if nm == 1:
        return out[:, 0], meta
    return out, meta


def p15_reference(blocks, cfg: EncCfg, dmap=None):
    """Bit-exact numpy mirror of phase 1.5 (the vectorized hash-chain
    walk): per POSITION, walk c -= delta[c] for cfg.chain steps from
    the map-0 candidate, rank every node by its matched-prefix length
    capped at cfg.pref bytes (>= 4 to qualify; strictly-longer wins, so
    the nearest node keeps ties), and return pass A's candidate maps
    with map 0 replaced by the winner and the delta map dropped.
    Output shape: (8, n) when cfg.ncand == 1, else (8, ncand, n)."""
    if dmap is None:
        dmap, _ = p1_reference(blocks, cfg)
    outs = np.zeros((8, cfg.ncand, cfg.n), np.int64)
    pos = np.arange(cfg.n)
    for b, data in enumerate(blocks):
        n = len(data)
        u8 = np.zeros(cfg.n + cfg.pref + 4, np.uint8)
        u8[:n] = np.frombuffer(data, np.uint8)
        cand = dmap[b][0]
        delta = dmap[b][-1]

        def plen(dist):
            """Matched-prefix length (capped cfg.pref) of p vs p-dist.
            Positions the walk evaluates satisfy p + pref <= n (cand
            exists only below n - MFLIMIT), so the zero pad is never
            ranked against real bytes."""
            src = pos - dist
            ok = dist > 0
            srcc = np.maximum(src, 0)
            m = ok.copy()
            ln = np.zeros(cfg.n, np.int64)
            for j in range(cfg.pref):
                m &= u8[srcc + j] == u8[pos + j]
                ln += m
            return np.where(ok, ln, 0)

        best_d = np.where(cand > 0, cand, 0)
        best_l = plen(best_d)
        cur = best_d.copy()
        walking = cand > 0
        for _ in range(int(cfg.chain)):
            if not walking.any():
                break
            nd = np.where(walking, delta[np.maximum(pos - cur, 0)], 0)
            cur2 = cur + nd
            valid = walking & (nd > 0) & (cur2 <= cfg.maxoff)
            ln = plen(np.where(valid, cur2, 0))
            take = valid & (ln >= 4) & (ln > best_l)
            best_d = np.where(take, cur2, best_d)
            best_l = np.where(take, ln, best_l)
            cur = np.where(valid, cur2, cur)
            walking = valid
        outs[b, 0] = best_d
        for m in range(1, cfg.ncand):
            outs[b, m] = dmap[b][m]
    if cfg.ncand == 1:
        return outs[:, 0]
    return outs
