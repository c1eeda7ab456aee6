"""Banded lane-parallel Pallas TPU block decoder (fastLZ4 codewords).

Decodes up to 128 independent block chains simultaneously. The unit of
parallelism is a SLOT: a sequence of inner 128 KB blocks (a compressed
stream's inner blocks stay in one slot, in order, because the LZ77 window is
shared across them, lib/lizard_compress.c:494-540). Slots are packed 8 per
sublane row ("group"); the kernel grid runs one group at a time; every
vector op advances 8 slots at once.

The decode loop is OUTPUT-BAND SYNCHRONOUS: each round, every live slot
emits exactly its next 1024 output bytes (a "band" = two ring tiles), so
the output position is uniform across slots and every memory write is a
static or uniform-dynamic store. Per round:

1. a token scan consumes tokens per slot and builds the band's per-byte
   SOURCE ENCODING, NP=8 (8,128) planes covering positions [128j, 128j+128):
     enc >= 0           literal byte at stream position (enc & POS_MASK);
                        bit CARRY_BIT selects which literal window serves it
     enc < 0            ring byte at band-relative source position enc
                        (i.e. -enc bytes before the band start)
   In-band back-references resolve at placement by copying already-placed
   encodings (one lane gather per source plane); overlapping matches are
   collapsed to their nearest pre-image before the band
   (s = start - off + (d mod off)), which is always either earlier in the
   band or within ring reach.
2. the band is materialized by gather chains: literals from the front
   windows; ring bytes via a DYNAMIC-REACH chain — one reduce finds the
   band's farthest back-reference and a fori_loop walks only the ring
   tiles actually touched (typ. a few KB, not the full 64/128 KB reach),
   reading each tile with a dynamic-sublane slice + lane gather;
3. the finished tile is packed to i32 words and DMA-flushed to HBM.

Streams (flags + literals, post-Huffman) live in a flat (rows,128) i32 HBM
pool, each block segment 512 B row-aligned. Three circular VMEM windows
follow the divergent per-slot pointers via row-DMA refills: parse (token
side-reads at lit_p), carry-copy (literal runs catching up after lit_p
jumped ahead), flags. Offset/ml-ext bytes that land beyond the parse
window's lookahead (huge literal runs) are DEFERRED: the token's match half
is fetched on a later round once the window has jumped (cur_ml sentinel -1).

Rationale: TPUs have no scatter/gather memory unit; the only native indexed
accesses are take_along_axis within an (8,128) tile (~1 vector-op, measured)
and dynamic-sublane slices. This decoder is built from those plus row DMAs,
which is why all per-slot divergence is routed through lane-dimension
gathers and all shared positions through sublane slices.

Format semantics mirror lib/lizard_decompress_lz4.h:7-163: token =
[ML<<4|LL] from the flags stream; literals, LE16 offsets and 254/255 length
extensions interleaved in the literals stream (doc/lizard_Block_format.md);
trailing literals = the literal-stream remainder once flags are exhausted.
"""

import functools
import os
from dataclasses import dataclass

_ABL = os.environ.get("LANE_ABL", "")  # temporary ablation hooks (perf work)
_FIXU = int(os.environ.get("LANE_FIXU", "2"))  # unrolled fixup steps/pass
_JMPU = int(os.environ.get("LANE_JMPU", "3"))  # unrolled jump steps
_NEAR = int(os.environ.get("LANE_NEAR", "4"))  # always-walked ring tiles
_WUNR = int(os.environ.get("LANE_WUNR", "4"))  # walk chains per fori step

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------- geometry
BAND = 512                   # bytes per slot per round (1 ring tile;
                             # 1024 loses: >128 tokens/band forces a
                             # continuation pass, see NOTES_ROUND2)
NP = BAND // 128             # enc planes per band
TPB = BAND // 512            # ring/output tiles per band
SUP_TILES = max(int(os.environ.get("LANE_SUP", "2")), TPB)
                             # 512-tiles per refill super (refills +
                             # block-transition work amortize over
                             # SUP_TILES*512 bytes; backing windows and
                             # lookahead scale below)
SUP_BANDS = SUP_TILES // TPB  # bands per refill super
# LA_P/NT_B below are calibrated only for SUP_TILES in {2, 4}: beyond that
# the worst-case parse consumption (SUP_BANDS-1)*~1280 B exceeds the
# lookahead and decodes would be silently wrong during ablation runs.
assert SUP_TILES in (2, 4), f"LANE_SUP={SUP_TILES} uncalibrated (use 2 or 4)"
RING_TILES = 130             # 130*512 = 66560 > 65535 (max offset) + BAND
RING_BYTES = RING_TILES * 512
NT_B = 8 if SUP_TILES <= 2 else 16
                             # parse BACKING window tiles (DMA-refilled);
                             # must cover LA_P + one super's consumption
NT_P = 4                     # parse FRONT window tiles (2 KB, vector-rebuilt)
NT_CB = NT_B                 # carry backing tiles
NT_C = 2                     # carry front tiles (1 KB: 511 align
                             # + up to BAND carry bytes per band)
NT_F = 4                     # flags backing tiles (2 KB)
NT_FF = 3                    # flags front tiles (1.5 KB, rebuilt per
                             # band; covers rep-dense LIZv1 bands: 511
                             # align + BAND 1-byte tokens + 128 lookahead)
NT_OB = 8                    # off16/off24 backing tiles (4 KB, LIZv1)
NT_O = 2                     # off16/off24 front tiles (1 KB, LIZv1)
LA_P = 2560 if SUP_TILES <= 2 else 5376
                             # backing lookahead bytes per refill: must
                             # cover (SUP_BANDS-1) bands' worst-case
                             # parse-stream consumption (~1280 B/band:
                             # BAND literals + 128 tokens x ~6 ext/off
                             # bytes) plus the DEFER_TH reach of the
                             # super's last band; window span LA_P+1 KB
                             # must fit NT_B*512
LA_C = LA_P
LA_F = 1024
LA_O = 2560
LIZ_RING_TILES = 258         # 258*512 = 132096 > 128 KB reach + BAND
DEFER_TH = 1500              # defer match fetch when lp2 > lit_p0 + DEFER_TH
                             # (<= NT_P*512 - 512 - 24 for coverage, and
                             # >= BAND + max per-band non-literal stream
                             # bytes (128 tokens x ~6) so a deferred
                             # token's literal run always completes the
                             # band -- the stall-free invariant)
DCAP = 14                    # max refill rows per stream per super (15=jump)
SUPERS_PER_BLOCK = 256       # 512 B supers (1 band each) * 256 = 128 KB
GROUPS = 16                  # 16 groups x 8 slots = 128 slots
BLOCK_OUT = 131072

CARRY_BIT = 1 << 24          # literal enc: bit 24 = serve from carry window
POS_MASK = CARRY_BIT - 1
FAR_BIT = 1 << 26            # enc: byte staged in the far window (LIZv1
                             # matches reaching beyond the in-VMEM ring, up
                             # to the format's 16 MB window); low bits =
                             # entry*512 + offset-within-tile
NFENT = 8                    # far-window entries (512 B output tiles DMAd
                             # back from flushed HBM output) per slot per
                             # band; bands needing more flag the block for
                             # host fallback

# ---- family-0 (fastLZ4) two-plane band geometry (NOTES_ROUND4 design):
# 1024-byte bands scanned as 256 tokens in two 128-lane planes.
# MEASURED NEGATIVE on hardware (round 5): -10 56.1 ms vs 42.1 ms at
# BAND=512. The halved per-band fixed costs (fronts, prologue, syncs,
# walk-operand hoists, flush bookkeeping) are outweighed by per-byte
# regressions: each serial fixup iteration must update BOTH token planes
# (~2x vector work at unchanged per-byte iteration count) and every
# placement/boundary lookup pays two plane-selected gathers per field.
# The scan machinery below stays NTP-generic; LANE_BAND2=1 re-enables the
# two-plane config for future probes. Default: single plane (identical
# geometry and schedule to the pre-refactor kernel for both families).
if os.environ.get("LANE_BAND2", "0") == "1":
    BAND_F0 = 1024
    NTP_F0 = 2               # token planes (256-token scan)
    NT_P_F0 = 7              # parse front tiles (3.5 KB)
    NT_C_F0 = 3              # carry front tiles (511 align + 1024 carry)
    NT_FF_F0 = 2             # flags front tiles (511 + 256 tokens + 128)
    LA_P_F0 = 3072           # parse lookahead; +1 KB band fits NT_B*512
    DEFER_TH_F0 = 2560       # = BAND_F0 + 256 tokens x 6 ext/off bytes
else:
    BAND_F0, NTP_F0 = 512, 1
    NT_P_F0, NT_C_F0, NT_FF_F0 = 4, 2, 3
    LA_P_F0, DEFER_TH_F0 = 2560 if SUP_TILES <= 2 else 5376, 1500

# family-1 aliases (the module-level values above): the kernel shadows
# BAND/NP/TPB/... with per-family locals chosen from these pairs
BAND_F1, NT_P_F1, NT_C_F1, NT_FF_F1 = BAND, NT_P, NT_C, NT_FF
LA_P_F1, DEFER_TH_F1 = LA_P, DEFER_TH

_MASK_B = NT_B * 512 - 1
_MASK_P = NT_P * 512 - 1
_MASK_CB = NT_CB * 512 - 1
_MASK_C = NT_C * 512 - 1
_MASK_F = NT_F * 512 - 1
_MASK_OB = NT_OB * 512 - 1


def _lanes8():
    return jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)


def _gchain(win, gbase, word_idx, ntiles):
    """win: tile k of this group at rows [(gbase+k)*8, +8). word_idx (8,128)
    in [0, ntiles*128). Per-element gather, chain-selected."""
    sub = word_idx & 127
    t = word_idx >> 7
    r = jnp.zeros((8, 128), jnp.int32)
    for k in range(ntiles):
        row0 = (gbase + k) * 8
        g = jnp.take_along_axis(win[row0:row0 + 8, :], sub, axis=1)
        r = jnp.where(t == k, g, r)
    return r


def _gchain_a512(win, gbase, tile_idx, ntiles):
    """512-aligned variant of _gchain: element (s, l) reads
    win[(gbase + tile_idx[s, l]) * 8 + s, l]. Used by the front rebuilds,
    whose bases are 512-aligned so the lane index is the identity — a pure
    per-slot tile select, no take_along_axis."""
    r = jnp.zeros((8, 128), jnp.int32)
    for k in range(ntiles):
        row0 = (gbase + k) * 8
        r = jnp.where(tile_idx == k, win[row0:row0 + 8, :], r)
    return r


def _shl(x, n):
    return jax.lax.shift_left(x, n.astype(jnp.uint32))


def _shr(x, n):
    return jax.lax.shift_right_logical(x, n.astype(jnp.uint32))


def _funnel4(win, gbase, byte_pos, ntiles, wrap=False):
    """uint32 of the 4 LE bytes at per-slot byte_pos. wrap=True treats
    the window as a mod-(ntiles*512) ring keyed by absolute position
    (the backing-window layout); wrap=False expects window-relative
    byte_pos already in range."""
    w0 = byte_pos >> 2
    if wrap:
        wm = ntiles * 128 - 1
        w0, w1 = w0 & wm, (w0 + 1) & wm
    else:
        w1 = w0 + 1
    a = _gchain(win, gbase, w0, ntiles).astype(jnp.uint32)
    b = _gchain(win, gbase, w1, ntiles).astype(jnp.uint32)
    sh = ((byte_pos & 3) << 3)
    lo = _shr(a, sh)
    hi = jnp.where(sh == 0, jnp.uint32(0), _shl(b, (32 - sh) & 31))
    return lo | hi


def _funnel8(win, gbase, byte_pos, ntiles):
    """Two uint32 funnels covering the 8 LE bytes at byte_pos — shares the
    middle word gather that separate _funnel4(p) + _funnel4(p+4) would
    duplicate."""
    w0 = byte_pos >> 2
    a = _gchain(win, gbase, w0, ntiles).astype(jnp.uint32)
    b = _gchain(win, gbase, w0 + 1, ntiles).astype(jnp.uint32)
    c = _gchain(win, gbase, w0 + 2, ntiles).astype(jnp.uint32)
    sh = ((byte_pos & 3) << 3)
    hi_b = jnp.where(sh == 0, jnp.uint32(0), _shl(b, (32 - sh) & 31))
    hi_c = jnp.where(sh == 0, jnp.uint32(0), _shl(c, (32 - sh) & 31))
    return _shr(a, sh) | hi_b, _shr(b, sh) | hi_c


def _byte_at(win, gbase, byte_pos, mask, ntiles):
    rel = byte_pos & mask
    w = _gchain(win, gbase, rel >> 2, ntiles).astype(jnp.uint32)
    return (_shr(w, (byte_pos & 3) << 3) & 255).astype(jnp.int32)


def _ext_from(first4):
    """Length extension (doc/lizard_Block_format.md:91-96): byte <254 ->
    value; 254 -> +LE16; 255 -> +LE24. Returns (value, nbytes) int32."""
    b0 = (first4 & 255).astype(jnp.int32)
    rest = _shr(first4, jnp.full_like(first4, 8))
    v16 = (rest & 0xFFFF).astype(jnp.int32)
    v24 = (rest & 0xFFFFFF).astype(jnp.int32)
    val = jnp.where(b0 < 254, b0, jnp.where(b0 == 254, v16, v24))
    n = jnp.where(b0 < 254, 1, jnp.where(b0 == 254, 3, 4))
    return val, n


def _mod(a, m):
    """a mod m, exact for 0<=a<2**18, 1<=m<2**17 (f32 division + fixups)."""
    q = jnp.floor(a.astype(jnp.float32) / m.astype(jnp.float32))
    r = a - q.astype(jnp.int32) * m
    r = jnp.where(r < 0, r + m, r)
    r = jnp.where(r >= m, r - m, r)
    return r


def _prefix_incl(x):
    """Inclusive per-row prefix sum along lanes (log-step rolls)."""
    lanes = _lanes8()
    s = x
    for k in (1, 2, 4, 8, 16, 32, 64):
        s = s + jnp.where(lanes >= k, pltpu.roll(s, k, 1), 0)
    return s


def _prefix_excl(x):
    """Exclusive per-row prefix sum along lanes."""
    lanes = _lanes8()
    s = _prefix_incl(x)
    return jnp.where(lanes >= 1, pltpu.roll(s, 1, 1), 0)


def _last_nonzero_scan(x, seed):
    """Per lane: the nearest preceding (or own) nonzero value of x; lanes
    before any nonzero get `seed`. Log-step propagate."""
    lanes = _lanes8()
    v = x
    for k in (1, 2, 4, 8, 16, 32, 64):
        prev = jnp.where(lanes >= k, pltpu.roll(v, k, 1), 0)
        v = jnp.where(v != 0, v, prev)
    return jnp.where(v != 0, v, seed)


def _search_count(ends, p, exact=False):
    """Per element of p: how many of the 128 ascending per-row `ends` are
    <= p (== index of the first end > p). Branchless binary search. The
    power-of-two ladder tops out at 127; pass exact=True where the
    all-128-match case must read 128 -- the consumption-boundary `cnt`
    NEEDS it (a band whose 128 tokens ALL end inside it otherwise
    mis-fires the partial-token path); placement lookups don't (their
    beyond-last-token positions are masked by the fill bound)."""
    c = jnp.zeros((8, 128), jnp.int32)
    for k in (64, 32, 16, 8, 4, 2, 1):
        m = c + k
        e = jnp.take_along_axis(ends, jnp.clip(m - 1, 0, 127), axis=1)
        c = jnp.where(e <= p, m, c)
    if exact:
        e = jnp.take_along_axis(ends, jnp.clip(c, 0, 127), axis=1)
        c = c + (e <= p).astype(jnp.int32)
    return c


def _at_lane(x, idx):
    """Broadcast x[row, idx[row]] across lanes; idx (8,128) row-uniform."""
    return jnp.take_along_axis(x, jnp.clip(idx, 0, 127), axis=1)


def _meta_row(meta_ref, row, g):
    """meta value for slots [g*8, g*8+8) -> (8,128), row s = slot g*8+s."""
    b = jnp.broadcast_to(meta_ref[pl.ds(row, 1), :], (8, 128))
    idx = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) + g * 8
    return jnp.take_along_axis(b, idx, axis=1)




def _lane_kernel(C, T, spb, rtiles, groups, il, family,
                 pool_hbm, meta_ref, out_hbm,
                 ring, pback, cback, fback, o16back, o24back,
                 pfront, cfront, o16front, o24front, ffront,
                 bounce, ltile, fwin, fmeta, trk, sems):
    """family: 0 = fastLZ4 codewords, 1 = LIZv1 codewords."""
    liz = family == 1
    # per-family band geometry: these LOCALS shadow the module globals for
    # every nested function below. Family 0 runs the two-plane 1024-byte
    # band; family 1 keeps the single-plane 512-byte band.
    if liz:
        NTP, BAND = 1, BAND_F1
        NT_P, NT_C, NT_FF = NT_P_F1, NT_C_F1, NT_FF_F1
        LA_P, DEFER_TH = LA_P_F1, DEFER_TH_F1
    else:
        NTP, BAND = NTP_F0, BAND_F0
        NT_P, NT_C, NT_FF = NT_P_F0, NT_C_F0, NT_FF_F0
        LA_P, DEFER_TH = LA_P_F0, DEFER_TH_F0
    NP = BAND // 128
    TPB = BAND // 512
    SUP_BANDS = SUP_TILES // TPB
    assert SUP_TILES % TPB == 0, "LANE_SUP must be a multiple of TPB"
    NTOK = NTP * 128             # tokens scanned per band
    LA_C = LA_P
    gi = pl.program_id(0)
    g0 = gi * il
    lanes = _lanes8()
    ring_bytes = rtiles * 512
    R = pool_hbm.shape[0]
    # streams: (la, jr); ptr/row0 wiring is positional (see below)
    NSTR = 5 if liz else 3
    LAs = [LA_P, LA_C, LA_F] + ([LA_O, LA_O] if liz else [])
    JRs = [(la >> 9) + 2 for la in LAs]
    BSTRIDE = 2 * NSTR * 8   # bounce rows per group: NSTR ptrs + NSTR fills
    BFILL = NSTR * 8

    # per-group state tuple layout
    #  0 alive  1 cur_ll  2 cur_ml  3 cur_off  4 cur_am  5 cur_src
    #  6 lit_p  7 flag_p  8 lit_len 9 flag_len 10 lit_row0 11 flag_row0
    # 12 emitted [13 p16 14 p24 15 last_off 16 o16_row0 17 o24_row0
    # 18 far_ovf (sticky per block: band wanted > NFENT far entries)]
    NG = 19 if liz else 13

    def super_body(pair, st):
        sup = pair * SUP_TILES
        gs, rp = st

        c = sup // spb
        at_boundary = (sup % spb) == 0

        @pl.when(at_boundary & (sup > 0))
        def _():
            for i in range(il):
                v = gs[i][12]
                if liz:    # far-entry overflow: flag the block (len = -1)
                    v = jnp.where(gs[i][18] != 0, -1, v)
                ltile[pl.ds(i * 8, 8), :] = v
            for i in range(il):
                cp = pltpu.make_async_copy(
                    ltile.at[pl.ds(i * 8, 8)],
                    out_hbm.at[pl.ds(
                        (groups * T + ((g0 + i) * C + c - 1)) * 8, 8)],
                    sems.at[1])
                cp.start()
                cp.wait()

        new_gs = []
        for i in range(il):
            def do_transition(_, i=i):
                f_row0 = _meta_row(meta_ref, c, g0 + i)
                f_len = _meta_row(meta_ref, C + c, g0 + i)
                l_row0 = _meta_row(meta_ref, 2 * C + c, g0 + i)
                l_len = _meta_row(meta_ref, 3 * C + c, g0 + i)
                has = (l_len >= 0).astype(jnp.int32)
                z = jnp.zeros((8, 128), jnp.int32)
                base = (has, z, z, jnp.ones((8, 128), jnp.int32), z, z, z, z,
                        jnp.maximum(l_len, 0), jnp.maximum(f_len, 0),
                        l_row0, f_row0, z)
                if liz:
                    o16r = _meta_row(meta_ref, 4 * C + c, g0 + i)
                    o24r = _meta_row(meta_ref, 5 * C + c, g0 + i)
                    base = base + (z, z, z, o16r, o24r, z)
                return base

            def no_transition(_, t=gs[i]):
                return t

            new_gs.append(jax.lax.cond(at_boundary, do_transition,
                                       no_transition, 0))
        gs = tuple(new_gs)

        def g_ptrs(gstate):
            """stream pointers + row0 values, positionally per stream."""
            ptrs = [gstate[6], gstate[5] & POS_MASK, gstate[7]]
            row0s = [gstate[10], gstate[10], gstate[11]]
            if liz:
                ptrs += [gstate[13], gstate[14]]
                row0s += [gstate[16], gstate[17]]
            return ptrs, row0s

        @pl.when(at_boundary)
        def _():
            for i in range(il):
                _, row0s = g_ptrs(gs[i])
                for k in range(NSTR):
                    bounce[pl.ds(i * BSTRIDE + k * 8, 8), :] = row0s[k]
                dead_fill = jnp.where(gs[i][0] != 0, 0, 1 << 28)
                for k in range(NSTR):
                    bounce[pl.ds(i * BSTRIDE + BFILL + k * 8, 8), :] = \
                        dead_fill

            def rs(sl, k):
                i = sl // 8
                for q in range(NSTR):
                    trk[sl, q] = 0
                    trk[sl, NSTR + q] = bounce[i * BSTRIDE + q * 8 + (sl & 7),
                                               0]
                return k
            jax.lax.fori_loop(0, il * 8, rs, 0)

        # ---- per-super-pair window refills (vector-decided) ----
        def deltas(ptr, fill, la, jr):
            frow = fill >> 9
            want = ((ptr + la) >> 9) + 1
            jump = (ptr >> 9) > frow
            d = jnp.clip(want - frow, 0, DCAP)
            d = jnp.where(jump, 15, d)
            nfill = jnp.where(
                jump, ((ptr >> 9) + jr) << 9,
                jnp.maximum(fill, jnp.minimum(want, frow + d) << 9))
            return d, nfill

        shmt = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 4
        lane0 = lanes == 0
        pks = []
        for i in range(il):
            ptrs, _ = g_ptrs(gs[i])
            pk_i = []
            for k in range(NSTR):
                f0 = bounce[i * BSTRIDE + BFILL + k * 8:
                            i * BSTRIDE + BFILL + k * 8 + 8, :]
                d_k, fill_k = deltas(ptrs[k], f0, LAs[k], JRs[k])
                bounce[i * BSTRIDE + BFILL + k * 8:
                       i * BSTRIDE + BFILL + k * 8 + 8, :] = fill_k
                bounce[i * BSTRIDE + k * 8:i * BSTRIDE + k * 8 + 8, :] = \
                    ptrs[k]
                pk_i.append(jnp.sum(jnp.where(
                    lane0, jax.lax.shift_left(d_k, shmt), 0)))
            pks.append(pk_i)

        def issue(sl, win, gbase, nt, row0, f_rows, d, jr, ptr_row):
            def dojump(_):
                pr = bounce[ptr_row, 0] >> 9
                return pr, pr + jr

            def nojump(_):
                return f_rows, f_rows + d
            r0, r1 = jax.lax.cond(d == 15, dojump, nojump, 0)

            def body(r, k):
                cp = pltpu.make_async_copy(
                    pool_hbm.at[pl.ds(
                        jnp.clip(row0 + r, 0, R - 1), 1)],
                    win.at[pl.ds((gbase + (r & (nt - 1))) * 8 + (sl & 7), 1)],
                    sems.at[0])
                cp.start()
                return k + 1
            return jax.lax.fori_loop(r0, r1, body, 0), r1

        backs = [(pback, NT_B), (cback, NT_CB), (fback, NT_F)] + \
            ([(o16back, NT_OB), (o24back, NT_OB)] if liz else [])
        n_dma = jnp.int32(0)
        for i in range(il):
            def per_slot(s8, k, i=i, pk_i=pks[i]):
                sl = i * 8 + s8
                for q in range(NSTR):
                    win, nt = backs[q]
                    dq = (pk_i[q] >> (s8 * 4)) & 15
                    nq, trk[sl, q] = issue(
                        sl, win, i * nt, nt, trk[sl, NSTR + q], trk[sl, q],
                        dq, JRs[q], i * BSTRIDE + q * 8 + s8)
                    k = k + nq
                return k
            n_dma = jax.lax.fori_loop(0, 8, per_slot, n_dma)

        def wait_one(k, x):
            pltpu.make_async_copy(
                pool_hbm.at[pl.ds(0, 1)], pback.at[pl.ds(0, 1)],
                sems.at[0]).wait()
            return x
        jax.lax.fori_loop(0, n_dma, wait_one, 0)

        # ------------------------------------------------ band machinery
        def band_prologue(i, stt):
            lit_p = stt[6]
            cur_src = stt[5]
            fb_p = lit_p & ~511
            for j in range(NT_P if _ABL != "skipfronts" else 0):
                tp_ = (((fb_p & _MASK_B) >> 9) + j) & (NT_B - 1)
                pfront[(i * NT_P + j) * 8:(i * NT_P + j) * 8 + 8, :] = \
                    _gchain_a512(pback, i * NT_B, tp_, NT_B)
            fb_c = (cur_src & POS_MASK) & ~511
            fill_c = bounce[i * BSTRIDE + BFILL + 8:
                            i * BSTRIDE + BFILL + 16, :]
            cov_c = (fb_c + NT_C * 512) <= fill_c
            for j in range(NT_C if _ABL != "skipfronts" else 0):
                tc_ = (((fb_c & _MASK_CB) >> 9) + j) & (NT_CB - 1)
                vc = _gchain_a512(cback, i * NT_CB, tc_, NT_CB)
                tcp = (((fb_c & _MASK_B) >> 9) + j) & (NT_B - 1)
                vp = _gchain_a512(pback, i * NT_B, tcp, NT_B)
                cfront[(i * NT_C + j) * 8:(i * NT_C + j) * 8 + 8, :] = \
                    jnp.where(cov_c, vc, vp)
            flag_p = stt[7]
            fb_f = flag_p & ~511
            for j in range(NT_FF if _ABL != "skipfronts" else 0):
                tf_ = (((fb_f & _MASK_F) >> 9) + j) & (NT_F - 1)
                ffront[(i * NT_FF + j) * 8:(i * NT_FF + j) * 8 + 8, :] = \
                    _gchain_a512(fback, i * NT_F, tf_, NT_F)
            fill_p = bounce[i * BSTRIDE + BFILL:i * BSTRIDE + BFILL + 8, :]
            covered = (fb_p + NT_P * 512) <= fill_p
            if not liz:
                return fb_p, fb_c, fb_f, covered, None, None
            p16, p24 = stt[9], stt[10]   # carry layout: 9 p16, 10 p24
            fb_16 = p16 & ~511
            fb_24 = p24 & ~511
            return fb_p, fb_c, fb_f, covered, fb_16, fb_24

        def band_emit_all(ctxs, band_rp, rt_h, all_encs, far_any):
            """Materialize every group's BAND-byte band and pack it into
            TPB (8,128) i32 word tiles. Ring bytes are fetched by ONE
            fused dynamic-reach chain: walk back only as many ring tiles
            as the farthest back-reference across all groups needs; each
            iteration carries il*NP independent gathers so the chain
            pipelines."""
            z = jnp.zeros((8, 128), jnp.int32)
            if _ABL == "skipemit":
                return [[z] * TPB for _ in range(il)]

            # farthest back-reference across groups (enc < 0 = -distance);
            # clamp keeps corrupt offsets (beyond the ring's reach) from
            # driving t_real out of bounds — those bytes stay 0,
            # garbage-in-garbage-out like a full chain
            min_enc = all_encs[0][0]
            for encs in all_encs:
                for e in encs:
                    min_enc = jnp.minimum(min_enc, e)
            K = jnp.minimum((-jnp.min(min_enc) + 511) >> 9, rtiles - 1)

            # hoisted per-element walk operands: target unwrapped tile id
            # (sentinel for non-ring bytes — never matches any t_un) and
            # the in-tile word gather index
            tts, gis = [], []
            for i in range(il):
                for j in range(NP):
                    e = all_encs[i][j]
                    pos = band_rp + e     # <0 allowed: >> floors
                    tts.append(jnp.where(e < 0, pos >> 9, 1 << 29))
                    gis.append((pos >> 2) & 127)

            def chain(k, rws):
                t_un = rt_h - k               # unwrapped tile id (compare)
                t_real = jnp.where(t_un < 0, t_un + rtiles, t_un)
                t_real = jnp.maximum(t_real, 0)   # unroll overshoot: sel miss
                out = []
                for i in range(il):
                    tile = ring[pl.ds((i * rtiles + t_real) * 8, 8), :]
                    for j in range(NP):
                        q = i * NP + j
                        g = jnp.take_along_axis(tile, gis[q], axis=1)
                        out.append(jnp.where(tts[q] == t_un, g, rws[q]))
                return tuple(out)

            init = tuple(z for _ in range(il * NP))
            NEAR = _NEAR                # tiles always walked (offsets are
            if _ABL == "k0":            # mostly < 2 KB); far reaches take
                rws = init              # the dynamic loop, usually 0 iters
            elif _ABL == "kstatic":
                rws = init
                for k in range(1, rtiles):
                    rws = chain(k, rws)
            else:
                UNR = _WUNR
                rws = init
                for k in range(1, NEAR + 1):
                    rws = chain(k, rws)
                Kfar = jnp.maximum(K - NEAR, 0)

                def chainU(q, rws):
                    for dk in range(UNR):
                        rws = chain(NEAR + 1 + q * UNR + dk, rws)
                    return rws
                rws = jax.lax.fori_loop(0, (Kfar + UNR - 1) // UNR, chainU,
                                        rws)

            tiles = []
            for i in range(il):
                fb_p, fb_c = ctxs[i][0], ctxs[i][1]
                accs = [z] * TPB
                if liz:
                    # far bytes: lane-gather from the DMA-staged far window
                    # (skipped entirely on far-free bands)
                    def get_far(_, i=i):
                        got = []
                        for j in range(NP):
                            e = all_encs[i][j]
                            fidx = e & (NFENT * 512 - 1)
                            w = _gchain(fwin, i * NFENT, fidx >> 2, NFENT)
                            got.append((_shr(w.astype(jnp.uint32),
                                             (fidx & 3) << 3)
                                        & 255).astype(jnp.int32))
                        return tuple(got)
                    fbytes = jax.lax.cond(
                        far_any[i], get_far,
                        lambda _: tuple(z for _ in range(NP)), 0)
                for j in range(NP):
                    enc = all_encs[i][j]
                    nonneg = enc >= 0
                    if liz:
                        is_far = nonneg & ((enc & FAR_BIT) != 0)
                        is_lit = nonneg & ((enc & FAR_BIT) == 0)
                    else:
                        is_far = None
                        is_lit = nonneg
                    from_carry = is_lit & ((enc & CARRY_BIT) != 0)
                    pos = enc & POS_MASK
                    if _ABL == "emitnolit":
                        lv = pos
                    else:
                        lv_p = _byte_at(pfront, i * NT_P, pos - fb_p,
                                        (1 << 30) - 1, NT_P)
                        lv_c = _byte_at(cfront, i * NT_C, pos - fb_c,
                                        (1 << 30) - 1, NT_C)
                        lv = jnp.where(from_carry, lv_c, lv_p)
                    rpos = band_rp + enc
                    rbyte = (_shr(rws[i * NP + j].astype(jnp.uint32),
                                  (rpos & 3) << 3) & 255).astype(jnp.int32)
                    band = jnp.where(is_lit, lv & 255, rbyte)
                    if liz:
                        band = jnp.where(is_far, fbytes[j], band)

                    p1 = band | _shl(
                        pltpu.roll(band, 127, 1).astype(jnp.uint32),
                        jnp.full_like(band, 8)).astype(jnp.int32)
                    p2 = p1 | _shl(
                        pltpu.roll(p1, 126, 1).astype(jnp.uint32),
                        jnp.full_like(band, 16)).astype(jnp.int32)
                    jq = j & 3
                    src_lane = jnp.clip((lanes - 32 * jq) * 4, 0, 127)
                    words = jnp.take_along_axis(p2, src_lane, axis=1)
                    wmask = (lanes >= 32 * jq) & (lanes < 32 * jq + 32)
                    accs[j >> 2] = jnp.where(wmask, words, accs[j >> 2])
                tiles.append(accs)
            return tiles

        # ------------------------------------------------ scan-parse band
        # (SURVEY.md section 7 step 3: token scan -> length prefix sums ->
        # placement). NTP plane(s) of 128 tokens parse at once per (8,128)
        # tile (lane = token index within plane): flag bytes are
        # random-accessible (1 byte/token), stream/output positions come
        # from lane prefix sums with cross-plane carries, rare ext-length
        # tokens are patched by a short fixup loop, and the band's bytes
        # find their covering token by per-plane binary searches.
        # Per-token state is carried as per-plane LISTS (fix fields 0-6);
        # the three defer fields are global token indices/values.
        INBAND = 1 << 25
        BIG = 1 << 29
        idx127 = jnp.full((8, 128), 127, jnp.int32)

        def prefix_excl_np(xs):
            """Per-plane exclusive lane prefix sums with cross-plane
            carry. Returns (list, grand total broadcast)."""
            outs, carry = [], jnp.zeros((8, 128), jnp.int32)
            for x in xs:
                inc = _prefix_incl(x)
                exc = jnp.where(lanes >= 1, pltpu.roll(inc, 1, 1), 0)
                outs.append(exc + carry)
                carry = carry + _at_lane(inc, idx127)
            return outs, carry

        def gat_tok(xs, idx):
            """Element-wise value at GLOBAL token index idx (8,128) in
            [0, NTOK): plane-selected take_along_axis."""
            v = jnp.take_along_axis(xs[0], jnp.clip(idx, 0, 127), axis=1)
            for tp in range(1, len(xs)):
                g = jnp.take_along_axis(
                    xs[tp], jnp.clip(idx - tp * 128, 0, 127), axis=1)
                v = jnp.where(idx >= tp * 128, g, v)
            return v

        def search_tok(ends_eff, p, exact=False):
            """Count of global token ends <= p across planes. Non-final
            planes always count exactly (a fully-covered plane must
            report 128, not the ladder's 127 cap)."""
            c = None
            for tp in range(len(ends_eff)):
                ex = exact or (tp < len(ends_eff) - 1)
                ct = _search_count(ends_eff[tp], p, exact=ex)
                c = ct if c is None else c + ct
            return c

        NFIX = 7 * NTP + 3

        def fix_flatten(fix):
            out = []
            for q in range(7):
                out.extend(fix[q])
            out.extend(fix[7:])
            return tuple(out)

        def fix_unflatten(ff):
            fix = [list(ff[q * NTP:(q + 1) * NTP]) for q in range(7)]
            return tuple(fix) + (ff[7 * NTP], ff[7 * NTP + 1],
                                 ff[7 * NTP + 2])

        def scan_A(i, ctx, B, st):
            """Straight-line parse prologue for group i: resolve a deferred
            match, classify NTOK tokens from the flags stream, build
            baseline prefix sums. Returns staging for fixup + placement."""
            (fb_p, fb_c, fb_f, covered, lit_p0, lit_len, flag_len,
             fb_16, fb_24) = ctx
            (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src, lit_p,
             flag_p, fill) = st[:9]

            # deferred-match resolution (lizard_decompress token resume):
            # reads sit at lit_p, which the refill jump has made resident
            pendv = (alive != 0) & (cur_ml == -1) & covered
            if not liz:
                G2, G3 = _funnel8(pfront, i * NT_P, lit_p - fb_p, NT_P)
                offp = (G2 & 0xFFFF).astype(jnp.int32)
                n0 = ((G2 >> jnp.uint32(16)) & 255).astype(jnp.int32)
                nrest = (_shr(G2, jnp.full_like(offp, 24)) |
                         _shl(G3, jnp.full_like(offp, 8)))
                nv16 = (nrest & 0xFFFF).astype(jnp.int32)
                nv24 = (nrest & 0xFFFFFF).astype(jnp.int32)
                nev = jnp.where(n0 < 254, n0,
                                jnp.where(n0 == 254, nv16, nv24))
                nen = jnp.where(n0 < 254, 1, jnp.where(n0 == 254, 3, 4))
                has_mlp = cur_am == 15
                mlp = jnp.where(has_mlp, nev + 15, cur_am) + 4
                cur_ml = jnp.where(pendv, mlp, cur_ml)
                cur_off = jnp.where(pendv, jnp.maximum(offp, 1), cur_off)
                lit_p = jnp.where(pendv,
                                  lit_p + 2 + jnp.where(has_mlp, nen, 0),
                                  lit_p)
                cur_am = jnp.where(pendv, 0, cur_am)
            else:
                F = _funnel4(pfront, i * NT_P, lit_p - fb_p, NT_P)
                nev, nen = _ext_from(F)
                cur_ml = jnp.where(pendv, nev + 15, cur_ml)
                lit_p = jnp.where(pendv, lit_p + nen, lit_p)

            blocked = cur_ml == -1          # still deferred: no tokens
            cml = jnp.maximum(cur_ml, 0)
            Pb = B + fill
            Bq = Pb + cur_ll + cml          # first token's output position

            nv = flag_len - flag_p
            is_tokL, is_tailL, flagL = [], [], []
            ll_vL, ml_vL, adv_vL, auxL, nonsimpleL = [], [], [], [], []
            for tp in range(NTP):
                tok = lanes + tp * 128
                is_tok = (tok < nv) & (alive != 0) & \
                    jnp.logical_not(blocked)
                is_tail = (tok == nv) & (alive != 0) & \
                    jnp.logical_not(blocked) & (nv < NTOK)
                flag = _byte_at(ffront, i * NT_FF, flag_p + tok - fb_f,
                                (1 << 30) - 1, NT_FF)
                flag = jnp.where(is_tok, flag, 0)

                if not liz:
                    ll0 = flag & 15
                    ml0v = flag >> 4
                    nonsimple = ((ll0 == 15) | (ml0v == 15)) & is_tok
                    ll_v = ll0
                    ml_v = jnp.where(is_tok, ml0v + 4, 0)
                    adv_v = jnp.where(is_tok, ll0 + 2, 0)
                    aux = (ll0, ml0v, None, None, None)
                else:
                    is_short = flag >= 32
                    is_rep = flag >= 128
                    ll0 = jnp.where(is_short, flag & 7, 0)
                    mls = (flag >> 3) & 15
                    nonsimple = ((is_short & ((ll0 == 7) | (mls == 15))) |
                                 (flag == 31)) & is_tok
                    ll_v = ll0
                    ml_v = jnp.where(
                        is_tok,
                        jnp.where(is_short, mls, flag + 16), 0)
                    adv_v = jnp.where(is_tok, ll0, 0)
                    u16 = (is_tok & is_short &
                           jnp.logical_not(is_rep)).astype(jnp.int32)
                    u24 = (is_tok &
                           jnp.logical_not(is_short)).astype(jnp.int32)
                    aux = (ll0, mls, is_short.astype(jnp.int32), u16, u24)
                ll_v = jnp.where(is_tok, ll_v, 0)
                is_tokL.append(is_tok)
                is_tailL.append(is_tail)
                flagL.append(flag)
                ll_vL.append(ll_v)
                ml_vL.append(ml_v)
                adv_vL.append(adv_v)
                auxL.append(aux)
                nonsimpleL.append(nonsimple.astype(jnp.int32))

            pre_sL, _ = prefix_excl_np(adv_vL)
            pre_oL, _ = prefix_excl_np(
                [ll + ml for ll, ml in zip(ll_vL, ml_vL)])
            z = jnp.zeros((8, 128), jnp.int32)
            fix = (pre_sL, pre_oL, ll_vL, ml_vL, adv_vL,
                   [z] * NTP, [z] * NTP,
                   jnp.full((8, 128), 999, jnp.int32), z, z)
            # fix: pre_s[] pre_o[] ll_v[] ml_v[] adv_v[] en_v[] done[]
            #      defer_at defer_lp2 defer_am
            inv = (lit_p, lit_p0, Bq, nonsimpleL, flagL, auxL, fb_p)
            carry9 = (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src,
                      lit_p, flag_p, fill)
            return fix, inv, carry9, (is_tokL, is_tailL, nv, blocked, Pb,
                                      cml)

        def pre_resolve_lz4(i, fix, inv):
            """Vector pre-pass: resolve every ml-ext-only token BEFORE the
            first ll-ext token in one shot. Their ext-byte positions don't
            depend on unread VALUES (only ll-ext values shift the stream),
            so with a 1-byte-ext speculation all reads issue in parallel;
            tokens from the first ll-ext / multi-byte-ext / deferred token
            onward stay for the serial fixup loop."""
            (pre_s, pre_o, ll_v, ml_v, adv_v, en_v, done, defer_at,
             defer_lp2, defer_am) = fix
            lit_p, lit_p0, Bq, nonsimple, flag, aux, fb_p = inv
            emlL = []
            for tp in range(NTP):
                ns = nonsimple[tp] != 0
                emlL.append(ns & (aux[tp][0] < 15))   # => ml0v == 15
            c1L, _ = prefix_excl_np([e.astype(jnp.int32) for e in emlL])
            b0L, badL = [], []
            first_bad = None
            for tp in range(NTP):
                ll0, ml0v = aux[tp][0], aux[tp][1]
                ns = nonsimple[tp] != 0
                lp2 = lit_p + pre_s[tp] + c1L[tp] + ll0
                mpos = lp2 + 2
                F = _funnel4(pfront, i * NT_P, mpos - fb_p, NT_P)
                b0 = (F & 255).astype(jnp.int32)
                dfr = lp2 > lit_p0 + DEFER_TH
                bad = (ns & (ll0 == 15)) | (emlL[tp] & ((b0 >= 254) | dfr))
                tokg = lanes + tp * 128
                fb_t = jnp.min(jnp.where(bad, tokg, 999), axis=1,
                               keepdims=True)
                first_bad = fb_t if first_bad is None \
                    else jnp.minimum(first_bad, fb_t)
                b0L.append(b0)
                badL.append(bad)
            first_bad = jnp.broadcast_to(first_bad, (8, 128))
            RL, d_outL = [], []
            for tp in range(NTP):
                tokg = lanes + tp * 128
                R = emlL[tp] & (tokg < first_bad)
                RL.append(R)
                d_outL.append(jnp.where(R, b0L[tp], 0))
            dRL, _ = prefix_excl_np([r.astype(jnp.int32) for r in RL])
            dDL, _ = prefix_excl_np(d_outL)
            for tp in range(NTP):
                R = RL[tp]
                ml_new = b0L[tp] + 19            # (b0+15) + MINMATCH
                pre_s[tp] = pre_s[tp] + dRL[tp]
                pre_o[tp] = pre_o[tp] + dDL[tp]
                ml_v[tp] = jnp.where(R, ml_new, ml_v[tp])
                adv_v[tp] = jnp.where(R, aux[tp][0] + 3, adv_v[tp])
                done[tp] = jnp.where(R, 1, done[tp])
            return (pre_s, pre_o, ll_v, ml_v, adv_v, en_v, done, defer_at,
                    defer_lp2, defer_am)

        def pre_resolve_liz(i, fix, inv):
            """LIZv1 analog of pre_resolve_lz4 (single plane): resolve
            short tokens whose only extension is the match length (ll0<7,
            mls==15) and long-match tokens (flag==31, ml ext at the
            token's own parse position) before the first ll-ext token,
            with the same 1-byte speculation. LIZv1 parse advance per
            unresolved token is tiny (ll0<=7 baseline, no inline offsets),
            so speculative positions stay well inside the front window up
            to the first bad lane."""
            (pre_s, pre_o, ll_v, ml_v, adv_v, en_v, done, defer_at,
             defer_lp2, defer_am) = fix
            lit_p, lit_p0, Bq, nonsimple, flag, aux, fb_p = inv
            ll0, mls, is_short_i = aux[0][0], aux[0][1], aux[0][2]
            ns = nonsimple[0] != 0
            short = is_short_i != 0
            f31 = flag[0] == 31
            eml = ns & ((short & (ll0 < 7) & (mls == 15)) | f31)
            c1 = _prefix_excl(eml.astype(jnp.int32))
            mpos = lit_p + pre_s[0] + c1 + ll0    # ll0 == 0 for flag31
            F = _funnel4(pfront, i * NT_P, mpos - fb_p, NT_P)
            b0 = (F & 255).astype(jnp.int32)
            dfr = mpos > lit_p0 + DEFER_TH
            bad = (ns & short & (ll0 == 7)) | (eml & ((b0 >= 254) | dfr))
            first_bad = jnp.broadcast_to(
                jnp.min(jnp.where(bad, lanes, 999), axis=1, keepdims=True),
                (8, 128))
            R = eml & (lanes < first_bad)
            ml_new = jnp.where(f31, b0 + 47, b0 + 15)
            d_out = jnp.where(R, b0, 0)
            pre_s[0] = pre_s[0] + _prefix_excl(R.astype(jnp.int32))
            pre_o[0] = pre_o[0] + _prefix_excl(d_out)
            ml_v[0] = jnp.where(R, ml_new, ml_v[0])
            adv_v[0] = jnp.where(R, ll0 + 1, adv_v[0])
            done[0] = jnp.where(R, 1, done[0])
            return (pre_s, pre_o, ll_v, ml_v, adv_v, en_v, done, defer_at,
                    defer_lp2, defer_am)

        def fix_body_one(i, B, fix, inv):
            """Resolve the next unprocessed ext-length token of group i."""
            (pre_s, pre_o, ll_v, ml_v, adv_v, en_v, done, defer_at,
             defer_lp2, defer_am) = fix
            lit_p, lit_p0, Bq, nonsimple, flag, aux, fb_p = inv
            sidx = None
            for tp in range(NTP):
                tokg = lanes + tp * 128
                pm = (nonsimple[tp] != 0) & (done[tp] == 0) & \
                    (Bq + pre_o[tp] < B + BAND) & (tokg < defer_at)
                m = jnp.min(jnp.where(pm, tokg, 999), axis=1,
                            keepdims=True)
                sidx = m if sidx is None else jnp.minimum(sidx, m)
            sidx = jnp.broadcast_to(sidx, (8, 128))
            hs = sidx < 999
            lp_s = lit_p + gat_tok(pre_s, sidx)
            flag_s = gat_tok(flag, sidx)
            if not liz:
                ll0s = gat_tok([a[0] for a in aux], sidx)
                ml0s = gat_tok([a[1] for a in aux], sidx)
                exll_s = ll0s == 15
                F = _funnel4(pfront, i * NT_P, lp_s - fb_p, NT_P)
                ev, en = _ext_from(F)
                ll_s = jnp.where(exll_s, ev + 15, ll0s)
                en_s = jnp.where(exll_s, en, 0)
                lp2 = lp_s + en_s + ll_s       # offset position
                dfr = hs & (lp2 > lit_p0 + DEFER_TH)
                exml_s = (ml0s == 15) & jnp.logical_not(dfr)
                M = _funnel4(pfront, i * NT_P, lp2 + 2 - fb_p, NT_P)
                ev2, en2 = _ext_from(M)
                ml_s = jnp.where(exml_s, ev2 + 15, ml0s) + 4
                nen_s = jnp.where(exml_s, en2, 0)
                full_adv = en_s + ll_s + 2 + nen_s
                base_adv = ll0s + 2
                base_out = ll0s + ml0s + 4
                am_s = ml0s
            else:
                ll0s = gat_tok([a[0] for a in aux], sidx)
                mlss = gat_tok([a[1] for a in aux], sidx)
                short_s = gat_tok([a[2] for a in aux], sidx) != 0
                flag31 = flag_s == 31
                exll_s = short_s & (ll0s == 7)
                F = _funnel4(pfront, i * NT_P, lp_s - fb_p, NT_P)
                ev, en = _ext_from(F)
                ll_s = jnp.where(exll_s, ev + 7, ll0s)
                en_s = jnp.where(exll_s, en, 0)
                lp2 = lp_s + en_s + ll_s       # short ml-ext position
                dfr = hs & short_s & (mlss == 15) & \
                    (lp2 > lit_p0 + DEFER_TH)
                # ml ext: short at lp2, token 31 at lp_s (no literals)
                mpos = jnp.where(short_s, lp2, lp_s)
                M = _funnel4(pfront, i * NT_P, mpos - fb_p, NT_P)
                ev2, en2 = _ext_from(M)
                exml_s = (short_s & (mlss == 15) &
                          jnp.logical_not(dfr)) | flag31
                ml_plain = jnp.where(short_s, mlss, flag_s + 16)
                ml_s = jnp.where(
                    exml_s,
                    jnp.where(flag31, ev2 + 47, ev2 + 15), ml_plain)
                nen_s = jnp.where(exml_s, en2, 0)
                full_adv = en_s + ll_s + nen_s
                base_adv = ll0s
                base_out = ll0s + ml_plain
                am_s = jnp.zeros((8, 128), jnp.int32)

            ml_fin = jnp.where(dfr, 0, ml_s)
            d_adv = full_adv - base_adv
            d_out = (ll_s + ml_fin) - base_out
            for tp in range(NTP):
                tokg = lanes + tp * 128
                s_eq = (tokg == sidx) & hs
                s_gt = (tokg > sidx) & hs
                pre_s[tp] = pre_s[tp] + jnp.where(s_gt, d_adv, 0)
                pre_o[tp] = pre_o[tp] + jnp.where(s_gt, d_out, 0)
                ll_v[tp] = jnp.where(s_eq, ll_s, ll_v[tp])
                ml_v[tp] = jnp.where(s_eq, ml_fin, ml_v[tp])
                adv_v[tp] = jnp.where(s_eq, full_adv, adv_v[tp])
                en_v[tp] = jnp.where(s_eq, en_s, en_v[tp])
                done[tp] = jnp.where(s_eq, 1, done[tp])
            new_def = dfr & (sidx < defer_at)
            defer_at = jnp.where(new_def, sidx, defer_at)
            defer_lp2 = jnp.where(new_def, lp2, defer_lp2)
            defer_am = jnp.where(new_def, am_s, defer_am)
            return (pre_s, pre_o, ll_v, ml_v, adv_v, en_v, done, defer_at,
                    defer_lp2, defer_am)

        def scan_C(i, ctx, B, fix, inv, carry9, masks, encs):
            """Offsets, consumption boundary, carry update, enc placement
            for group i after the fixup loop."""
            (fb_p, fb_c, fb_f, covered, lit_p0, lit_len, flag_len,
             fb_16, fb_24) = ctx
            (pre_s, pre_o, ll_v, ml_v, adv_v, en_v, done, defer_at,
             defer_lp2, defer_am) = fix
            lit_p, lit_p0_, Bq, nonsimple, flag, aux, _ = inv
            (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src, lit_p_c,
             flag_p, fill) = carry9
            is_tok, is_tail, nv, blocked, Pb, cml = masks
            if liz:
                p16, p24, last_off = encs[NP], encs[NP + 1], encs[NP + 2]
                encs = encs[:NP]
            encs = list(encs)

            # tail pseudo-token: the literal-stream remainder
            nvc = jnp.clip(nv, 0, NTOK - 1)
            ll_tail = jnp.maximum(
                lit_len - (lit_p + gat_tok(pre_s, nvc)), 0)
            lsrc_v = []
            for tp in range(NTP):
                ll_v[tp] = jnp.where(is_tail[tp], ll_tail, ll_v[tp])
                adv_v[tp] = jnp.where(is_tail[tp], ll_tail, adv_v[tp])
                lsrc_v.append(lit_p + pre_s[tp] + en_v[tp])

            # per-token offsets
            if not liz:
                off_raw = []
                for tp in range(NTP):
                    OW = _funnel4(pfront, i * NT_P,
                                  lsrc_v[tp] + ll_v[tp] - fb_p, NT_P)
                    off_raw.append((OW & 0xFFFF).astype(jnp.int32))
            else:
                u16, u24 = aux[0][3], aux[0][4]
                p16rel = 2 * _prefix_excl(u16)
                p24rel = 3 * _prefix_excl(u24)
                O16 = _funnel4(o16back, i * NT_OB, p16 + p16rel,
                               NT_OB, wrap=True)
                O24 = _funnel4(o24back, i * NT_OB, p24 + p24rel,
                               NT_OB, wrap=True)
                cand = jnp.where(
                    u16 != 0, (O16 & 0xFFFF).astype(jnp.int32),
                    jnp.where(u24 != 0,
                              (O24 & 0xFFFFFF).astype(jnp.int32), 0))
                off_raw = [_last_nonzero_scan(cand, last_off)]
            off_safe = [jnp.maximum(o, 1) for o in off_raw]

            # consumption boundary (binary search over output end points)
            consum, oadv = [], []
            for tp in range(NTP):
                tokg = lanes + tp * 128
                cs = ((is_tok[tp] & (tokg <= defer_at)) |
                      (is_tail[tp] & (nv <= defer_at)))
                consum.append(cs)
                oadv.append(jnp.where(cs, ll_v[tp] + ml_v[tp], 0))
            ends, ecar = [], jnp.zeros((8, 128), jnp.int32)
            for tp in range(NTP):
                inc = _prefix_incl(oadv[tp])
                ends.append(Bq + ecar + inc)
                ecar = ecar + _at_lane(inc, idx127)
            ends_eff = [jnp.where(consum[tp], ends[tp], BIG)
                        for tp in range(NTP)]
            starts = [ends_eff[tp] - oadv[tp] for tp in range(NTP)]
            pe = B + BAND - 1
            cnt = search_tok(ends_eff, jnp.full((8, 128), 1, jnp.int32)
                             * pe, exact=True)
            cntc = jnp.clip(cnt, 0, NTOK - 1)
            start_c = gat_tok(starts, cntc)
            partial = (cnt < NTOK) & (start_c <= pe)
            used = (B + BAND) - start_c
            ll_c = gat_tok(ll_v, cntc)
            ml_c = gat_tok(ml_v, cntc)
            lsrc_c = gat_tok(lsrc_v, cntc)
            off_c = gat_tok(off_safe, cntc)
            adv_c = gat_tok(adv_v, cntc)
            pre_c = gat_tok(pre_s, cntc)
            tail_c = partial & (cntc == nvc) & (nv < NTOK)
            defer_c = partial & (cntc == defer_at)

            # carry for the next pass/band
            avail = jnp.maximum(B + BAND - Pb, 0)
            c_ll_used = jnp.clip(cur_ll, 0, avail)
            c_ml_used = jnp.clip(cml, 0, avail - c_ll_used)
            ncur_ll = jnp.where(partial, jnp.maximum(ll_c - used, 0),
                                cur_ll - c_ll_used)
            rem_ml = jnp.where(cur_ml == -1, -1, cml - c_ml_used)
            ncur_ml = jnp.where(
                partial,
                jnp.where(defer_c, -1,
                          ml_c - jnp.maximum(used - ll_c, 0)),
                rem_ml)
            ncur_src = jnp.where(partial, lsrc_c + jnp.minimum(used, ll_c),
                                 cur_src + c_ll_used)
            ncur_off = jnp.where(partial, off_c, cur_off)
            ncur_am = jnp.where(partial,
                                jnp.where(defer_c, defer_am, 0), cur_am)
            # stream pointers advance past consumed tokens
            tot_s = _at_lane(pre_s[NTP - 1] + adv_v[NTP - 1], idx127)
            adv_full = jnp.where(cnt <= NTOK - 1, pre_c, tot_s)
            nlit_p = lit_p + adv_full + \
                jnp.where(partial,
                          jnp.where(defer_c, defer_lp2 - (lit_p + pre_c),
                                    adv_c), 0)
            nflag_p = flag_p + jnp.minimum(
                cnt + partial.astype(jnp.int32), nv)
            nalive = jnp.where(
                tail_c | (cnt > nv), 0, alive)
            if liz:
                tot16 = _at_lane(p16rel + 2 * u16, idx127)
                tot24 = _at_lane(p24rel + 3 * u24, idx127)
                u16_c = _at_lane(u16, cntc)
                u24_c = _at_lane(u24, cntc)
                np16 = p16 + jnp.where(cnt <= 127, _at_lane(p16rel, cntc),
                                       tot16) + \
                    jnp.where(partial & (u16_c != 0), 2, 0)
                np24 = p24 + jnp.where(cnt <= 127, _at_lane(p24rel, cntc),
                                       tot24) + \
                    jnp.where(partial & (u24_c != 0), 3, 0)
                idx_last = cnt - 1 + partial.astype(jnp.int32)
                nlast_off = jnp.where(
                    idx_last >= 0,
                    _at_lane(off_raw[0], jnp.clip(idx_last, 0, 127)),
                    last_off)

            # fill progress
            Xc = jnp.minimum(Bq, B + BAND)
            X = jnp.where(
                partial, B + BAND,
                jnp.where(cnt >= 1,
                          jnp.minimum(gat_tok(ends_eff,
                                              jnp.clip(cnt - 1, 0,
                                                       NTOK - 1)),
                                      B + BAND),
                          Xc))
            X = jnp.maximum(X, Xc)
            nfill = jnp.clip(X - B, fill, BAND)

            # ---- enc placement for this pass's positions
            coff = jnp.maximum(cur_off, 1)
            tag = jnp.where(fill == 0, CARRY_BIT, 0)
            for j in range(NP):
                p = B + j * 128 + lanes
                idx = search_tok(ends_eff, p)
                idxc = jnp.clip(idx, 0, NTOK - 1)
                st_t = gat_tok(starts, idxc)
                ll_t = gat_tok(ll_v, idxc)
                ls_t = gat_tok(lsrc_v, idxc)
                of_t = gat_tok(off_safe, idxc)
                q = jnp.clip(p - st_t, 0, 1 << 17)
                il_b = q < ll_t
                enc_l = ls_t + q
                m = jnp.clip(q - ll_t, 0, BAND - 1)
                src = st_t + ll_t - of_t + _mod(m, of_t)
                src_b = src - B
                encv = jnp.where(
                    il_b, enc_l,
                    jnp.where(src_b >= 0, INBAND | src_b, src_b))
                pc = p - Pb
                in_cl = (pc >= 0) & (pc < cur_ll)
                in_cm = (pc >= cur_ll) & (pc < cur_ll + cml)
                enc_cl = (cur_src + pc) | tag
                mseg = jnp.clip(pc - cur_ll, 0, BAND - 1)
                src2 = (Pb + cur_ll) - coff + _mod(mseg, coff) - B
                enc_cm = jnp.where(src2 >= 0, INBAND | src2, src2)
                encv = jnp.where(in_cl, enc_cl,
                                 jnp.where(in_cm, enc_cm, encv))
                # beyond this pass's fill: zero (garbage INBAND pointers
                # there would cycle the jump loop)
                encv = jnp.where(p < X, encv, 0)
                encs[j] = jnp.where(p < B + fill, encs[j], encv)

            out = (nalive, ncur_ll, ncur_ml, ncur_off, ncur_am, ncur_src,
                   nlit_p, nflag_p, nfill) + tuple(encs)
            if liz:
                out = out + (np16, np24, nlast_off)
            return out

        NSC = (9 + NP + 3) if liz else (9 + NP)

        def scan_passes(ctxs, B, flat):
            """One full scan pass (A -> fused fixup -> C) for all groups."""
            sts = [flat[i * NSC:(i + 1) * NSC] for i in range(il)]
            fixes, invs, carrys, masksl = [], [], [], []
            for i in range(il):
                fix, inv, carry9, masks = scan_A(i, ctxs[i], B, sts[i])
                if _ABL != "skippre":
                    fix = (pre_resolve_liz if liz else
                           pre_resolve_lz4)(i, fix, inv)
                fixes.append(fix)
                invs.append(inv)
                carrys.append(carry9)
                masksl.append(masks)
            # NOTE: scan_A may update carry vars (pend resolution);
            # carry9 returned by scan_A is authoritative.

            def f_cond(ff):
                c = None
                for i in range(il):
                    (pre_s, pre_o, _, _, _, _, done, defer_at, _, _) = \
                        fix_unflatten(ff[i * NFIX:(i + 1) * NFIX])
                    _, _, Bq, nonsimple, _, _, _ = invs[i]
                    for tp in range(NTP):
                        tokg = lanes + tp * 128
                        pm = (nonsimple[tp] != 0) & (done[tp] == 0) & \
                            (Bq + pre_o[tp] < B + BAND) & (tokg < defer_at)
                        v = jnp.any(pm)
                        c = v if c is None else (c | v)
                return c

            def f_body(ff):
                out = []
                for i in range(il):
                    out.extend(fix_flatten(fix_body_one(
                        i, B, fix_unflatten(ff[i * NFIX:(i + 1) * NFIX]),
                        invs[i])))
                return tuple(out)

            fflat = tuple()
            for f in fixes:
                fflat = fflat + fix_flatten(f)
            if _ABL != "skipfix":
                # pay the first _FIXU fixup steps as masked straight-line
                # vector work (f_body is a no-op on groups with nothing
                # pending); the while_loop — whose condition is a scalar
                # sync every iteration — only handles the tail. (A fully
                # bounded fixup that punts the tail to the continuation
                # pass was measured SLOWER: full-pass retries cost more
                # than the narrow while iterations they replace.)
                for _ in range(_FIXU):
                    fflat = f_body(fflat)
                fflat = jax.lax.while_loop(f_cond, f_body, fflat)

            out = []
            for i in range(il):
                fix = fix_unflatten(fflat[i * NFIX:(i + 1) * NFIX])
                encs = list(sts[i][9:9 + NP]) + \
                    (list(sts[i][9 + NP:9 + NP + 3]) if liz else [])
                out.extend(scan_C(i, ctxs[i], B, fix, invs[i], carrys[i],
                                  masksl[i], encs))
            return tuple(out)

        def one_band_scan(carries, band_rp, rt_h, B, abs_t):
            ctxs = []
            flat = []
            z = jnp.zeros((8, 128), jnp.int32)
            for i in range(il):
                cr = carries[i]
                fb_p, fb_c, fb_f, covered, fb_16, fb_24 = \
                    band_prologue(i, cr)
                ctxs.append((fb_p, fb_c, fb_f, covered, cr[6],
                             gs[i][8], gs[i][9], fb_16, fb_24))
                st = (cr[0], cr[1], cr[2], cr[3], cr[4], cr[5], cr[6],
                      cr[7], z) + tuple(z for _ in range(NP))
                if liz:
                    st = st + (cr[9], cr[10], cr[11])
                flat.extend(st)

            flat = scan_passes(ctxs, B, tuple(flat))

            # rare continuation (LIZv1 rep tokens can emit < 4 bytes each,
            # so 128 tokens may not cover the band)
            def c_cond(fl):
                c = None
                for i in range(il):
                    s = fl[i * NSC:(i + 1) * NSC]
                    v = jnp.any((s[8][:, 0:1] < BAND) & (s[0][:, 0:1] != 0)
                                & (s[2][:, 0:1] != -1))
                    c = v if c is None else (c | v)
                return c

            def c_body(fl):
                return scan_passes(ctxs, B, fl)

            if _ABL != "skipcont":
                flat = jax.lax.while_loop(c_cond, c_body, flat)

            # resolve in-band pointers (log-depth path halving)
            all_encs = [[flat[i * NSC + 9 + j] for j in range(NP)]
                        for i in range(il)]

            def j_cond(es):
                c = None
                for k in range(il * NP):
                    v = jnp.any((es[k] >= 0) & ((es[k] & INBAND) != 0))
                    c = v if c is None else (c | v)
                return c

            def j_body(es):
                out = []
                for i in range(il):
                    cur = [es[i * NP + j] for j in range(NP)]
                    for j in range(NP):
                        e = cur[j]
                        isb = (e >= 0) & ((e & INBAND) != 0)
                        sb = e & (BAND - 1)
                        val = jnp.zeros((8, 128), jnp.int32)
                        for t in range(NP):
                            g = jnp.take_along_axis(
                                cur[t], jnp.clip(sb - t * 128, 0, 127),
                                axis=1)
                            val = jnp.where((sb >> 7) == t, g, val)
                        out.append(jnp.where(isb, val, e))
                return tuple(out)

            es = []
            for encs in all_encs:
                es.extend(encs)
            if _ABL != "skipjump":
                # _JMPU unconditional halving steps (masked no-ops once
                # resolved) before the synced while for deep-chain tails
                es = tuple(es)
                for _ in range(_JMPU):
                    es = j_body(es)
                es = jax.lax.while_loop(j_cond, j_body, es)
            all_encs = [[es[i * NP + j] for j in range(NP)]
                        for i in range(il)]

            # ---- far matches (LIZv1 only): sources beyond the ring's
            # reach live in already-flushed HBM output. Rewrite their encs
            # to FAR_BIT | entry*512 + sub, record each slot's distinct
            # source tiles, DMA those rows back into the far window, and
            # let band_emit_all serve them from there. Slots needing more
            # than NFENT entries in one band set the sticky far_ovf flag
            # (block reported len = -1 -> host fallback).
            far_any = [None] * il
            ovfs = [None] * il
            if liz:
                RING_REACH = (rtiles - 1) * 512
                idx127 = jnp.full((8, 128), 127, jnp.int32)
                nf = jnp.int32(0)
                for i in range(il):
                    encs_i = all_encs[i]
                    fms = [e < -RING_REACH for e in encs_i]
                    af = fms[0]
                    for m in fms[1:]:
                        af = af | m
                    af_any = jnp.any(af)
                    far_any[i] = af_any

                    def do_far(encs_t, i=i, fms=fms):
                        base = jnp.zeros((8, 128), jnp.int32)
                        p_last_t = jnp.full((8, 128), -2, jnp.int32)
                        p_last_f = jnp.zeros((8, 128), jnp.int32)
                        eids, tils, vals, news = [], [], [], []
                        for j in range(NP):
                            e = encs_t[j]
                            m = fms[j]
                            mi = m.astype(jnp.int32)
                            asrc = jnp.maximum(abs_t * 512 + e, 0)
                            tile = asrc >> 9
                            sub = asrc & 511
                            pt = jnp.where(lanes == 0, p_last_t,
                                           pltpu.roll(tile, 1, 1))
                            pf = jnp.where(lanes == 0, p_last_f,
                                           pltpu.roll(mi, 1, 1))
                            marker = (mi != 0) & ((pf == 0) | (pt != tile))
                            eid = base + _prefix_incl(
                                marker.astype(jnp.int32)) - 1
                            base = base + jnp.broadcast_to(
                                jnp.sum(marker.astype(jnp.int32), axis=1,
                                        keepdims=True), (8, 128))
                            p_last_t = jnp.take_along_axis(tile, idx127, 1)
                            p_last_f = jnp.take_along_axis(mi, idx127, 1)
                            valid = m & (eid < NFENT)
                            news.append(jnp.where(
                                valid, FAR_BIT | (eid * 512 + sub), e))
                            eids.append(eid)
                            tils.append(tile)
                            vals.append(valid)
                        ovf = (base > NFENT).astype(jnp.int32)
                        M = jnp.full((8, 128), -1, jnp.int32)
                        for k in range(NFENT):
                            vk = jnp.full((8, 1), -1, jnp.int32)
                            for j in range(NP):
                                vk = jnp.maximum(vk, jnp.max(
                                    jnp.where(vals[j] & (eids[j] == k),
                                              tils[j], -1),
                                    axis=1, keepdims=True))
                            M = jnp.where(lanes == k,
                                          jnp.broadcast_to(vk, (8, 128)), M)
                        return tuple(news) + (ovf, M)

                    def no_far(encs_t):
                        return tuple(encs_t) + (
                            jnp.zeros((8, 128), jnp.int32),
                            jnp.full((8, 128), -1, jnp.int32))

                    res = jax.lax.cond(af_any, do_far, no_far,
                                       tuple(encs_i))
                    all_encs[i] = list(res[:NP])
                    ovfs[i] = res[NP]
                    M = res[NP + 1]
                    fmeta[pl.ds(i * 8, 8), :] = M
                    nf = nf + jnp.sum(jnp.where(lanes < NFENT,
                                                (M >= 0).astype(jnp.int32),
                                                0))
                for i in range(il):
                    @pl.when(far_any[i])
                    def _(i=i):
                        def per_slot(s8, k):
                            for q in range(NFENT):
                                tk = fmeta[i * 8 + s8, q]

                                @pl.when(tk >= 0)
                                def _():
                                    cp = pltpu.make_async_copy(
                                        out_hbm.at[pl.ds(
                                            ((g0 + i) * T + tk) * 8 + s8,
                                            1)],
                                        fwin.at[pl.ds(
                                            (i * NFENT + q) * 8 + s8, 1)],
                                        sems.at[3])
                                    cp.start()
                            return k
                        jax.lax.fori_loop(0, 8, per_slot, 0)

                def fwait(k, x):
                    pltpu.make_async_copy(
                        out_hbm.at[pl.ds(0, 1)], fwin.at[pl.ds(0, 1)],
                        sems.at[3]).wait()
                    return x
                jax.lax.fori_loop(0, nf, fwait, 0)

            tiles = band_emit_all(ctxs, band_rp, rt_h, all_encs, far_any)
            new_carries = []
            for i in range(il):
                s = flat[i * NSC:(i + 1) * NSC]
                emitted = carries[i][8] + (s[8] - 0)
                nc = (s[0], s[1], s[2], s[3], s[4], s[5] & POS_MASK,
                      s[6], s[7], emitted)
                if liz:
                    nc = nc + (s[9 + NP], s[10 + NP], s[11 + NP],
                               carries[i][12] | ovfs[i])
                new_carries.append(nc)
            return new_carries, tiles

        # carries layout: 0 alive 1 cur_ll 2 cur_ml 3 cur_off 4 cur_am
        #                 5 cur_src 6 lit_p 7 flag_p 8 emitted
        #                 [9 p16 10 p24 11 last_off 12 far_ovf]
        def g_to_carry(g):
            cr = g[:8] + (g[12],)
            if liz:
                cr = cr + (g[13], g[14], g[15], g[18])
            return cr

        carries = [g_to_carry(g) for g in gs]
        for half in range(SUP_BANDS):
            sup_h = sup + half * TPB
            rp_h = rp + half * BAND
            rp_h = jnp.where(rp_h >= ring_bytes, rp_h - ring_bytes, rp_h)
            rt_h = rp_h >> 9
            rts = [rt_h]
            for tp in range(1, TPB):
                rts.append(jnp.where(rts[-1] + 1 >= rtiles, 0, rts[-1] + 1))
            B = (sup_h - c * spb) * 512   # block-relative band base (bytes)
            carries, tiles = one_band_scan(carries, rp_h, rt_h, B, sup_h)
            # drain the PREVIOUS band's flush DMAs before reusing sems
            @pl.when(sup_h > 0)
            def _():
                for i in range(il):
                    for tp in range(TPB):
                        pltpu.make_async_copy(
                            ring.at[pl.ds(0, 8)],
                            out_hbm.at[pl.ds(0, 8)],
                            sems.at[2]).wait()
            for i in range(il):
                for tp in range(TPB):
                    ring[pl.ds((i * rtiles + rts[tp]) * 8, 8), :] = \
                        tiles[i][tp]
            for i in range(il):
                for tp in range(TPB):
                    cp = pltpu.make_async_copy(
                        ring.at[pl.ds((i * rtiles + rts[tp]) * 8, 8)],
                        out_hbm.at[pl.ds(
                            ((g0 + i) * T + sup_h + tp) * 8, 8)],
                        sems.at[2])
                    cp.start()

        out_gs = []
        for i in range(il):
            cr = carries[i]
            g = cr[:8] + (gs[i][8], gs[i][9], gs[i][10], gs[i][11], cr[8])
            if liz:
                g = g + (cr[9], cr[10], cr[11], gs[i][16], gs[i][17],
                         cr[12])
            out_gs.append(g)

        rp2 = rp + SUP_TILES * 512
        rp2 = jnp.where(rp2 >= ring_bytes, rp2 - ring_bytes, rp2)
        return tuple(out_gs), rp2

    z = jnp.zeros((8, 128), jnp.int32)
    g_init = (z, z, z, z + 1, z, z, z, z, z, z, z, z, z)
    if liz:
        g_init = g_init + (z, z, z, z, z, z)
    st = (tuple(g_init for _ in range(il)), jnp.int32(0))
    gs_fin, rp_fin = jax.lax.fori_loop(0, T // SUP_TILES, super_body, st)

    for i in range(il):
        for tp in range(TPB):
            pltpu.make_async_copy(
                ring.at[pl.ds(0, 8)],
                out_hbm.at[pl.ds(0, 8)],
                sems.at[2]).wait()
    for i in range(il):
        vfin = gs_fin[i][12]
        if liz:
            vfin = jnp.where(gs_fin[i][18] != 0, -1, vfin)
        ltile[pl.ds(i * 8, 8), :] = vfin
    for i in range(il):
        cp = pltpu.make_async_copy(
            ltile.at[pl.ds(i * 8, 8)],
            out_hbm.at[pl.ds((groups * T + ((g0 + i) * C + C - 1)) * 8, 8)],
            sems.at[1])
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("C", "T", "spb", "rtiles",
                                             "groups", "il", "family",
                                             "interpret"))
def _lane_call(pool, meta, C, T, spb, rtiles, groups, il=1, family=0,
               interpret=False):
    kernel = functools.partial(_lane_kernel, C, T, spb, rtiles, groups,
                               il, family)
    liz = family == 1
    nstr = 5 if liz else 3
    ob = NT_OB if liz else 1
    of = NT_O if liz else 1
    # per-family front-window tile counts (must match the kernel's locals)
    nt_p = NT_P_F1 if liz else NT_P_F0
    nt_c = NT_C_F1 if liz else NT_C_F0
    nt_ff = NT_FF_F1 if liz else NT_FF_F0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(groups // il,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((il * rtiles * 8, 128), jnp.int32),
            pltpu.VMEM((il * NT_B * 8, 128), jnp.int32),
            pltpu.VMEM((il * NT_CB * 8, 128), jnp.int32),
            pltpu.VMEM((il * NT_F * 8, 128), jnp.int32),
            pltpu.VMEM((il * ob * 8, 128), jnp.int32),
            pltpu.VMEM((il * ob * 8, 128), jnp.int32),
            pltpu.VMEM((il * nt_p * 8, 128), jnp.int32),
            pltpu.VMEM((il * nt_c * 8, 128), jnp.int32),
            pltpu.VMEM((il * of * 8, 128), jnp.int32),
            pltpu.VMEM((il * of * 8, 128), jnp.int32),
            pltpu.VMEM((il * nt_ff * 8, 128), jnp.int32),
            pltpu.VMEM((il * 2 * nstr * 8, 128), jnp.int32),
            pltpu.VMEM((il * 8, 128), jnp.int32),
            pltpu.VMEM((il * (NFENT if liz else 1) * 8, 128), jnp.int32),
            pltpu.VMEM((il * 8 if liz else 8, 128), jnp.int32),
            pltpu.SMEM((il * 8, 2 * nstr), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(((groups * T + groups * C) * 8, 128),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pool, meta)


# ------------------------------------------------------------------ host

@dataclass
class LaneBatch:
    pool: np.ndarray          # (R,128) i32 word pool (all streams)
    meta: np.ndarray          # (4C or 6C,128) i32: frow0/flen/lrow0/llen
                              # (+ o16row0/o24row0 for LIZv1)
    C: int                    # max blocks per slot
    placement: list           # block index -> (slot, chain_pos)
    family: int = 0           # 0 = fastLZ4, 1 = LIZv1


def prepare_lane_batch(batch, groups=GROUPS) -> LaneBatch:
    """Schedule a BlockBatch onto groups*8 slots and build the stream pool.
    Blocks of one stream stay in one slot, in order (shared window)."""
    n = batch.n_blocks
    n_slots = groups * 8
    # chains: consecutive blocks with the same stream_id
    chains = []
    i = 0
    while i < n:
        j = i
        while j < n and batch.stream_id[j] == batch.stream_id[i]:
            j += 1
        chains.append(list(range(i, j)))
        i = j
    # longest-first onto least-loaded slots
    order = sorted(range(len(chains)), key=lambda k: -len(chains[k]))
    loads = [0] * n_slots
    slot_blocks = [[] for _ in range(n_slots)]
    for k in order:
        s = min(range(n_slots), key=lambda q: loads[q])
        slot_blocks[s].extend(chains[k])
        loads[s] += len(chains[k])
    C = max(1, max(loads))

    # pool: 512-byte-aligned segments, +4 guard rows
    segs = []
    cursor = 0

    def add_seg(arr):
        nonlocal cursor
        rows = max(1, (len(arr) + 511) // 512)
        a = np.zeros(rows * 512, np.uint8)
        a[:len(arr)] = arr
        segs.append(a)
        row0 = cursor
        cursor += rows
        return row0

    from lizard_tpu.format.levels import Codewords
    liz = batch.codewords == Codewords.LIZv1
    nmeta = 6 * C if liz else 4 * C
    meta = np.full((nmeta, 128), -1, np.int32)
    meta[0:2 * C] = 0
    if liz:
        meta[4 * C:] = 0
    placement = [None] * n
    for s in range(n_slots):
        for cpos, b in enumerate(slot_blocks[s]):
            frow = add_seg(batch.flags[batch.flags_off[b]:
                                       batch.flags_off[b] + batch.flags_len[b]])
            lrow = add_seg(batch.literals[batch.lit_off[b]:
                                          batch.lit_off[b] + batch.lit_len[b]])
            meta[cpos, s] = frow
            meta[C + cpos, s] = int(batch.flags_len[b])
            meta[2 * C + cpos, s] = lrow
            meta[3 * C + cpos, s] = int(batch.lit_len[b])
            if liz:
                meta[4 * C + cpos, s] = add_seg(
                    batch.off16[batch.off16_off[b]:
                                batch.off16_off[b] + batch.off16_len[b]])
                meta[5 * C + cpos, s] = add_seg(
                    batch.off24[batch.off24_off[b]:
                                batch.off24_off[b] + batch.off24_len[b]])
            placement[b] = (s, cpos)
    segs.append(np.zeros(4 * 512, np.uint8))
    cursor += 4
    pool = np.concatenate(segs).view(np.int32).reshape(cursor, 128)
    return LaneBatch(pool=pool, meta=meta, C=C, placement=placement,
                     family=1 if liz else 0)


def decode_batch_lanes(batch, interpret=False, spb=SUPERS_PER_BLOCK,
                       rtiles=None, groups=GROUPS,
                       il=1) -> list[bytes]:
    """Decode a BlockBatch (fastLZ4 or LIZv1 codewords) with the lane
    kernel. Returns the decoded bytes of every block, in batch order.

    spb/rtiles/groups shrink the geometry for tests: blocks must decode to
    <= spb*512 bytes and fastLZ4 offsets must stay < (rtiles-2)*512 - 128.
    Production values cover 128 KB blocks with 64 KB offsets (fastLZ4) /
    128 KB in-ring reach (LIZv1). LIZv1 matches reaching beyond the ring
    (chained multi-block streams share a window up to 16 MB,
    lizard_common.h:223-231) are served from flushed HBM output via the
    kernel's far window; bands needing more than NFENT far tiles flag
    their block (len = -1) and the whole chain is re-decoded by the
    bit-exact host oracle."""
    lane = prepare_lane_batch(batch, groups=groups)
    if rtiles is None:
        rtiles = LIZ_RING_TILES if lane.family else RING_TILES
    T = lane.C * spb
    out = _lane_call(jnp.asarray(lane.pool), jnp.asarray(lane.meta),
                     C=lane.C, T=T, spb=spb, rtiles=rtiles, groups=groups,
                     il=il, family=lane.family, interpret=interpret)
    blocks = unpack_lane_output(np.asarray(out), lane, T, spb=spb,
                                groups=groups)
    # host fallback: far-window overflow (len = -1 -> None) or a chained
    # stream violating the layout invariant that every non-final inner
    # block decodes to exactly spb*512 bytes (the reference encoder always
    # cuts at LIZARD_BLOCK_SIZE; only corrupt/foreign streams differ, and
    # the kernel's ring arithmetic assumes it)
    full = spb * 512
    bad_sids = set()
    n = batch.n_blocks
    for b in range(n):
        nxt = b + 1 < n and batch.stream_id[b + 1] == batch.stream_id[b]
        if blocks[b] is None or (nxt and len(blocks[b]) != full):
            bad_sids.add(int(batch.stream_id[b]))
    for sid in bad_sids:
        idxs = [b for b in range(n) if int(batch.stream_id[b]) == sid]
        for b, data in zip(idxs, _host_decode_chain(batch, idxs)):
            blocks[b] = data
    return blocks


def _host_decode_chain(batch, idxs: list[int]) -> list[bytes]:
    """Bit-exact host decode of one block chain (fallback for far-window
    overflow / layout-invariant violations). Streams are post-entropy; feed
    them straight to the oracle's token loop (ref/block_decode.py) with the
    shared window."""
    from lizard_tpu.ref.block_decode import (_Stream, _decode_block_liz,
                                             _decode_block_lz4)
    out = bytearray()
    res = []
    for b in idxs:
        streams = {}
        for name, arr, off, ln in (
                ("flags", batch.flags, batch.flags_off, batch.flags_len),
                ("literals", batch.literals, batch.lit_off, batch.lit_len),
                ("off16", batch.off16, batch.off16_off, batch.off16_len),
                ("off24", batch.off24, batch.off24_off, batch.off24_len)):
            o = int(off[b])
            streams[name] = _Stream(
                bytes(arr[o:o + int(ln[b])]), 0, int(ln[b]))
        prev = len(out)
        from lizard_tpu.format.levels import Codewords
        if batch.codewords == Codewords.LIZv1:
            _decode_block_liz(streams, out, 0)
        else:
            _decode_block_lz4(streams, out, 0)
        res.append(bytes(out[prev:]))
    return res


def unpack_lane_output(out: np.ndarray, lane: LaneBatch, T: int,
                       spb=SUPERS_PER_BLOCK, groups=GROUPS) -> list[bytes]:
    data = out[:groups * T * 8].reshape(groups, T, 8, 128)
    lens = out[groups * T * 8:].reshape(groups, lane.C, 8, 128)[:, :, :, 0]
    # slot bytes: group g, sublane s -> rows [g, :, s, :]
    results = []
    for b, (s, cpos) in enumerate(lane.placement):
        gq, sq = divmod(s, 8)
        blk_len = int(lens[gq, cpos, sq])
        if blk_len < 0:       # far-window overflow: host fallback decodes
            results.append(None)
            continue
        t0 = cpos * spb
        nt = (blk_len + 511) // 512
        words = data[gq, t0:t0 + nt, sq, :]
        raw = words.astype(np.int32).tobytes()  # LE words == byte order
        results.append(raw[:blk_len])
    return results


def decompress_lanes(streams: list[bytes], interpret=False,
                     spb=SUPERS_PER_BLOCK, rtiles=None,
                     groups=GROUPS, il=1, entropy=None) -> list[bytes]:
    """Decode independent compressed streams (either codeword family);
    returns decoded bytes per stream. entropy="tpu" batches Huffman-coded
    streams onto the lane-packed Huff0 kernel (ops/huf128.py); default is
    the native host decoder ("host"), or "tpu" automatically when running
    on a real TPU backend and not interpreting."""
    from lizard_tpu.ops.split import split_streams
    if entropy is None:
        entropy = "host"
        if not interpret:
            try:
                import jax
                if jax.default_backend() not in ("cpu",):
                    entropy = "tpu"
            except Exception:
                pass
    batch = split_streams(streams, entropy=entropy)
    blocks = decode_batch_lanes(batch, interpret=interpret, spb=spb,
                                rtiles=rtiles, groups=groups, il=il)
    outs = []
    i = 0
    for sid in range(int(batch.stream_id.max()) + 1 if batch.n_blocks else 0):
        parts = []
        while i < batch.n_blocks and batch.stream_id[i] == sid:
            parts.append(blocks[i])
            i += 1
        outs.append(b"".join(parts))
    return outs
