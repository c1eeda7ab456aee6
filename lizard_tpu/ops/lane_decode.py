"""Banded lane-parallel Pallas TPU block decoder (fastLZ4 codewords).

Decodes up to 128 independent block chains simultaneously. The unit of
parallelism is a SLOT: a sequence of inner 128 KB blocks (a compressed
stream's inner blocks stay in one slot, in order, because the LZ77 window is
shared across them, lib/lizard_compress.c:494-540). Slots are packed 8 per
sublane row ("group"); the kernel grid runs one group at a time; every
vector op advances 8 slots at once.

The decode loop is OUTPUT-BAND SYNCHRONOUS: each round, every live slot
emits exactly its next 128 output bytes (a "band"), so the output position
is uniform across slots and every memory write is a static or
uniform-dynamic store. Per round:

1. a while-loop consumes tokens per slot and builds the band's per-byte
   SOURCE ENCODING vector `enc` (8 slots x 128 positions):
     enc >= 0           literal byte at stream position (enc & POS_MASK);
                        bit CARRY_BIT selects which literal window serves it
     enc < 0            ring byte at index -(enc+1) (last 64 KB of output)
   In-band back-references resolve at placement by copying already-placed
   encodings (one lane gather); overlapping matches are collapsed to their
   nearest pre-image before the band (s = start - off + (d mod off)), which
   is always either earlier in the band or within ring reach.
2. the band is materialized by gather chains: ring bytes from a 129-tile
   ring of packed i32 words laid out (tile*8 + slot, 128) -- reads are
   static-tile lane gathers, the write one dynamic-sublane slice;
3. 4 bands fill one 512 B ring tile, which is DMA-flushed to HBM.

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
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------- geometry
BAND = 128                   # bytes per slot per round
RING_TILES = 129             # 129*512 = 66048 > 65535 (max offset) + BAND
RING_BYTES = RING_TILES * 512
NT_B = 16                    # parse BACKING window tiles (8 KB, DMA-refilled)
NT_P = 2                     # parse FRONT window tiles (1 KB, vector-rebuilt)
NT_CB = 8                    # carry backing tiles (4 KB)
NT_C = 2                     # carry front tiles (1 KB)
NT_F = 4                     # flags backing tiles (2 KB, read directly)
NT_OB = 8                    # off16/off24 backing tiles (4 KB, LIZv1)
NT_O = 2                     # off16/off24 front tiles (1 KB, LIZv1)
LA_P = 5120                  # backing lookahead bytes per refill
LA_C = 2560
LA_F = 1024
LA_O = 2560
LIZ_RING_TILES = 257         # 257*512 = 131584 > 128 KB frame-block reach
DEFER_TH = 480               # defer match fetch when lp2 > lit_p0 + DEFER_TH
DCAP = 14                    # max refill rows per stream per super (15=jump)
SUPERS_PER_BLOCK = 256       # 4 bands/super * 256 supers = 128 KB
GROUPS = 16                  # 16 groups x 8 slots = 128 slots
BLOCK_OUT = 131072

CARRY_BIT = 1 << 24          # literal enc: bit 24 = serve from carry window
POS_MASK = CARRY_BIT - 1

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


def _shl(x, n):
    return jax.lax.shift_left(x, n.astype(jnp.uint32))


def _shr(x, n):
    return jax.lax.shift_right_logical(x, n.astype(jnp.uint32))


def _funnel4(win, gbase, byte_pos, ntiles):
    """uint32 of the 4 LE bytes at per-slot window-relative byte_pos."""
    w0 = byte_pos >> 2
    a = _gchain(win, gbase, w0, ntiles).astype(jnp.uint32)
    b = _gchain(win, gbase, w0 + 1, ntiles).astype(jnp.uint32)
    sh = ((byte_pos & 3) << 3)
    lo = _shr(a, sh)
    hi = jnp.where(sh == 0, jnp.uint32(0), _shl(b, (32 - sh) & 31))
    return lo | hi


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


def _meta_row(meta_ref, row, g):
    """meta value for slots [g*8, g*8+8) -> (8,128), row s = slot g*8+s."""
    b = jnp.broadcast_to(meta_ref[pl.ds(row, 1), :], (8, 128))
    idx = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) + g * 8
    return jnp.take_along_axis(b, idx, axis=1)


# per-group while-loop state: 11 arrays
_NST = 11


def _lane_kernel(C, T, spb, rtiles, groups, il, family,
                 pool_hbm, meta_ref, out_hbm,
                 ring, pback, cback, fback, o16back, o24back,
                 pfront, cfront, o16front, o24front,
                 bounce, ltile, trk, sems):
    """family: 0 = fastLZ4 codewords, 1 = LIZv1 codewords."""
    liz = family == 1
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
    # 12 emitted [13 p16 14 p24 15 last_off 16 o16_row0 17 o24_row0]
    NG = 18 if liz else 13

    def super_body(pair, st):
        sup = pair * 2
        gs, rp = st

        c = sup // spb
        at_boundary = (sup % spb) == 0

        @pl.when(at_boundary & (sup > 0))
        def _():
            for i in range(il):
                ltile[pl.ds(i * 8, 8), :] = gs[i][12]
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
                    base = base + (z, z, z, o16r, o24r)
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
            for j in range(NT_P):
                widx = ((((fb_p & _MASK_B) >> 2) + j * 128 + lanes)
                        & (NT_B * 128 - 1))
                pfront[(i * NT_P + j) * 8:(i * NT_P + j) * 8 + 8, :] = \
                    _gchain(pback, i * NT_B, widx, NT_B)
            fb_c = (cur_src & POS_MASK) & ~511
            fill_c = bounce[i * BSTRIDE + BFILL + 8:
                            i * BSTRIDE + BFILL + 16, :]
            cov_c = (fb_c + NT_C * 512) <= fill_c
            for j in range(NT_C):
                wc = ((((fb_c & _MASK_CB) >> 2) + j * 128 + lanes)
                      & (NT_CB * 128 - 1))
                vc = _gchain(cback, i * NT_CB, wc, NT_CB)
                wp = ((((fb_c & _MASK_B) >> 2) + j * 128 + lanes)
                      & (NT_B * 128 - 1))
                vp = _gchain(pback, i * NT_B, wp, NT_B)
                cfront[(i * NT_C + j) * 8:(i * NT_C + j) * 8 + 8, :] = \
                    jnp.where(cov_c, vc, vp)
            fill_p = bounce[i * BSTRIDE + BFILL:i * BSTRIDE + BFILL + 8, :]
            covered = (fb_p + NT_P * 512) <= fill_p
            if not liz:
                return fb_p, fb_c, covered, None, None
            p16, p24 = stt[9], stt[10]   # carry layout: 9 p16, 10 p24
            fb_16 = p16 & ~511
            fb_24 = p24 & ~511
            for j in range(NT_O):
                w = ((((fb_24 & _MASK_OB) >> 2) + j * 128 + lanes)
                     & (NT_OB * 128 - 1))
                o24front[(i * NT_O + j) * 8:(i * NT_O + j) * 8 + 8, :] = \
                    _gchain(o24back, i * NT_OB, w, NT_OB)
            for j in range(NT_O):
                w = ((((fb_16 & _MASK_OB) >> 2) + j * 128 + lanes)
                     & (NT_OB * 128 - 1))
                o16front[(i * NT_O + j) * 8:(i * NT_O + j) * 8 + 8, :] = \
                    _gchain(o16back, i * NT_OB, w, NT_OB)
            return fb_p, fb_c, covered, fb_16, fb_24

        def w_body_single(i, ctx, band_rp, stt):
            fb_p, fb_c, covered, lit_p0, lit_len, flag_len, fb_16, fb_24 = ctx
            if liz:
                (startv, fillv, alive, cur_ll, cur_ml, cur_off, cur_am,
                 cur_src, lit_p, flag_p, enc, p16, p24, last_off) = stt
            else:
                (startv, fillv, alive, cur_ll, cur_ml, cur_off, cur_am,
                 cur_src, lit_p, flag_p, enc) = stt
            space = 128 - startv

            aliveb = alive != 0
            pend = (aliveb & (cur_ml == -1) & (cur_ll == 0) &
                    (space > 0) & covered)
            need = aliveb & (cur_ll == 0) & (cur_ml == 0) & (space > 0)
            exhausted = flag_p >= flag_len
            tail = need & exhausted
            fetch = need & jnp.logical_not(exhausted)

            flag = _byte_at(fback, i * NT_F, flag_p, _MASK_F, NT_F)
            if not liz:
                ll0 = flag & 15
                F1 = _funnel4(pfront, i * NT_P, lit_p - fb_p, NT_P)
                ev, en = _ext_from(F1)
                has_ll = ll0 == 15
                ll = jnp.where(has_ll, ev + 15, ll0)
                lp1 = lit_p + jnp.where(has_ll, en, 0)
                lp2 = lp1 + ll
                defer = lp2 > lit_p0 + DEFER_TH
                mpos = jnp.where(pend, lit_p, lp2)
                G2 = _funnel4(pfront, i * NT_P, mpos - fb_p, NT_P)
                G3 = _funnel4(pfront, i * NT_P, mpos + 4 - fb_p, NT_P)
                off = (G2 & 0xFFFF).astype(jnp.int32)
                n0 = ((G2 >> jnp.uint32(16)) & 255).astype(jnp.int32)
                nrest = (_shr(G2, jnp.full_like(off, 24)) |
                         _shl(G3, jnp.full_like(off, 8)))
                nv16 = (nrest & 0xFFFF).astype(jnp.int32)
                nv24 = (nrest & 0xFFFFFF).astype(jnp.int32)
                nev = jnp.where(n0 < 254, n0,
                                jnp.where(n0 == 254, nv16, nv24))
                nen = jnp.where(n0 < 254, 1, jnp.where(n0 == 254, 3, 4))
                ml0f = flag >> 4
                ml0 = jnp.where(pend, cur_am, ml0f)
                has_ml = ml0 == 15
                ml = jnp.where(has_ml, nev + 15, ml0) + 4

                cur_ml = jnp.where(pend, ml, cur_ml)
                cur_off = jnp.where(pend, jnp.maximum(off, 1), cur_off)
                lit_p = jnp.where(
                    pend, lit_p + 2 + jnp.where(has_ml, nen, 0), lit_p)
                cur_am = jnp.where(pend, 0, cur_am)

                cur_ll = jnp.where(fetch, ll, cur_ll)
                cur_src = jnp.where(fetch, lp1, cur_src)
                cur_ml = jnp.where(fetch, jnp.where(defer, -1, ml), cur_ml)
                cur_off = jnp.where(fetch & jnp.logical_not(defer),
                                    jnp.maximum(off, 1), cur_off)
                cur_am = jnp.where(fetch, jnp.where(defer, ml0f, 0), cur_am)
                lit_p = jnp.where(
                    fetch,
                    jnp.where(defer, lp2,
                              lp2 + 2 + jnp.where(has_ml, nen, 0)),
                    lit_p)
                flag_p = jnp.where(fetch, flag_p + 1, flag_p)
            else:
                # LIZv1 codewords (lib/lizard_decompress_liz.h:14-220):
                # [1_MMMM_LLL] rep / [0_MMMM_LLL] new 16-bit offset /
                # tokens 0..30 ML=token+16 w/ 24-bit offset /
                # token 31 ext-ML (>=47) w/ 24-bit offset
                is_short = flag >= 32
                is_rep = flag >= 128
                ll0 = flag & 7
                F1 = _funnel4(pfront, i * NT_P, lit_p - fb_p, NT_P)
                ev, en = _ext_from(F1)
                has_ll = is_short & (ll0 == 7)
                ll = jnp.where(is_short,
                               jnp.where(has_ll, ev + 7, ll0), 0)
                lp1 = lit_p + jnp.where(has_ll, en, 0)
                lp2 = lp1 + ll
                # offsets come from their own streams (always resident)
                O16 = _funnel4(o16front, i * NT_O, p16 - fb_16, NT_O)
                off16v = (O16 & 0xFFFF).astype(jnp.int32)
                O24 = _funnel4(o24front, i * NT_O, p24 - fb_24, NT_O)
                off24v = (O24 & 0xFFFFFF).astype(jnp.int32)
                # match length: short ext sits after the literal run (defer
                # candidate); token-31 ext sits at lit_p (always resident)
                mls = (flag >> 3) & 15
                has_mls = is_short & (mls == 15)
                mpos = jnp.where(pend, lit_p,
                                 jnp.where(is_short, lp2, lit_p))
                G2 = _funnel4(pfront, i * NT_P, mpos - fb_p, NT_P)
                nev, nen = _ext_from(G2)
                ml_short = jnp.where(mls == 15, nev + 15, mls)
                ml_long = jnp.where(flag == 31, nev + 47, flag + 16)
                ml = jnp.where(is_short, ml_short, ml_long)
                defer = has_mls & (lp2 > lit_p0 + DEFER_TH)

                # resolve a deferred short-token ml-ext
                mlp = nev + 15
                cur_ml = jnp.where(pend, mlp, cur_ml)
                lit_p = jnp.where(pend, lit_p + nen, lit_p)

                # fetch: update rep state and consume offset streams
                use16 = fetch & is_short & jnp.logical_not(is_rep)
                use24 = fetch & jnp.logical_not(is_short)
                last_off = jnp.where(use16, off16v,
                                     jnp.where(use24, off24v, last_off))
                p16 = p16 + jnp.where(use16, 2, 0)
                p24 = p24 + jnp.where(use24, 3, 0)
                cur_off = jnp.where(fetch, jnp.maximum(last_off, 1),
                                    cur_off)
                cur_ll = jnp.where(fetch, ll, cur_ll)
                cur_src = jnp.where(fetch, lp1, cur_src)
                cur_ml = jnp.where(fetch, jnp.where(defer, -1, ml), cur_ml)
                # consumed ml-ext bytes: short non-deferred ext at lp2;
                # token 31 ext at lit_p
                ext31 = fetch & jnp.logical_not(is_short) & (flag == 31)
                nshort = jnp.where(has_mls & jnp.logical_not(defer), nen, 0)
                lit_p = jnp.where(
                    fetch,
                    jnp.where(is_short, lp2 + nshort,
                              lit_p + jnp.where(ext31, nen, 0)),
                    lit_p)
                flag_p = jnp.where(fetch, flag_p + 1, flag_p)
                cur_am = jnp.where(pend, 0, cur_am)

            tail_ll = jnp.maximum(lit_len - lit_p, 0)
            cur_ll = jnp.where(tail, tail_ll, cur_ll)
            cur_src = jnp.where(tail, lit_p, cur_src)
            lit_p = jnp.where(tail, lit_len, lit_p)
            alive = jnp.where(tail, 0, alive)

            live_run = cur_ll > 0
            tl = jnp.clip(cur_ll, 0, space) * live_run
            m_l = (lanes >= startv) & (lanes < startv + tl)
            enc = jnp.where(m_l, cur_src + (lanes - startv), enc)
            cur_src = cur_src + tl
            cur_ll = cur_ll - tl
            startv = startv + tl
            space = 128 - startv

            live_m = (cur_ml > 0) & (cur_ll == 0)
            tm = jnp.clip(cur_ml, 0, space) * live_m
            d = jnp.clip(lanes - startv, 0, 1 << 17)
            rmod = _mod(d, cur_off)
            src_band = startv - cur_off + rmod
            inb = src_band >= 0
            ring_idx = band_rp + src_band
            ring_idx = jnp.where(ring_idx < 0, ring_idx + ring_bytes,
                                 ring_idx)
            ring_idx = jnp.where(ring_idx >= ring_bytes,
                                 ring_idx - ring_bytes, ring_idx)
            copied = jnp.take_along_axis(enc, jnp.clip(src_band, 0, 127),
                                         axis=1)
            encm = jnp.where(inb, copied, -ring_idx - 1)
            m_m = (lanes >= startv) & (lanes < startv + tm)
            enc = jnp.where(m_m, encm, enc)
            cur_ml = jnp.where(live_m, cur_ml - tm, cur_ml)
            startv = startv + tm
            fillv = fillv + tl + tm

            startv = jnp.where(
                (cur_ll == 0) & (cur_ml == 0) & (alive == 0), 128, startv)
            startv = jnp.where(
                (cur_ll == 0) & (cur_ml == -1) & jnp.logical_not(covered),
                128, startv)
            base = (startv, fillv, alive, cur_ll, cur_ml, cur_off,
                    cur_am, cur_src, lit_p, flag_p, enc)
            if liz:
                base = base + (p16, p24, last_off)
            return base

        NST = 14 if liz else 11

        def band_emit(i, ctx, acc, rt_h, ph, wst):
            fb_p, fb_c = ctx[0], ctx[1]
            enc = wst[10]
            is_lit = enc >= 0
            from_carry = is_lit & ((enc & CARRY_BIT) != 0)
            pos = enc & POS_MASK
            lv_p = _byte_at(pfront, i * NT_P, pos - fb_p, (1 << 30) - 1, NT_P)
            lv_c = _byte_at(cfront, i * NT_C, pos - fb_c, (1 << 30) - 1, NT_C)
            lv = jnp.where(from_carry, lv_c, lv_p)
            ridx = jnp.where(is_lit, 0, -enc - 1)
            rv = _gchain(ring, i * rtiles, ridx >> 2, rtiles)
            # bytes of this half's earlier bands live in `acc`, not the ring
            in_acc = jnp.logical_not(is_lit) & ((ridx >> 9) == rt_h)
            arel = ridx & 511
            av = jnp.take_along_axis(acc, (arel >> 2) & 127, axis=1)
            rv = jnp.where(in_acc, av, rv)
            rbyte = (_shr(rv.astype(jnp.uint32), (ridx & 3) << 3)
                     & 255).astype(jnp.int32)
            band = jnp.where(is_lit, lv & 255, rbyte)

            p1 = band | _shl(pltpu.roll(band, 127, 1).astype(jnp.uint32),
                             jnp.full_like(band, 8)).astype(jnp.int32)
            p2 = p1 | _shl(pltpu.roll(p1, 126, 1).astype(jnp.uint32),
                           jnp.full_like(band, 16)).astype(jnp.int32)
            src_lane = jnp.clip((lanes - 32 * ph) * 4, 0, 127)
            words = jnp.take_along_axis(p2, src_lane, axis=1)
            wmask = (lanes >= 32 * ph) & (lanes < 32 * ph + 32)
            return jnp.where(wmask, words, acc)

        def one_band(ph, carries, accs, rp_h, rt_h):
            band_rp = rp_h + ph * BAND
            ctxs = []
            inits = []
            for i in range(il):
                cr = carries[i]
                alive, cur_ll, cur_ml, cur_src, lit_p = (
                    cr[0], cr[1], cr[2], cr[5], cr[6])
                fb_p, fb_c, covered, fb_16, fb_24 = band_prologue(i, cr)
                ctxs.append((fb_p, fb_c, covered, lit_p,
                             gs[i][8], gs[i][9], fb_16, fb_24))
                pend0 = (cur_ll > 0) | (cur_ml != 0) | (alive != 0)
                startv0 = jnp.where(pend0, 0, 128)
                ini = (startv0, jnp.zeros((8, 128), jnp.int32), alive,
                       cur_ll, cur_ml, cr[3], cr[4],
                       cur_src | jnp.where(cur_ll > 0, CARRY_BIT, 0),
                       lit_p, cr[7], jnp.zeros((8, 128), jnp.int32))
                if liz:
                    ini = ini + (cr[9], cr[10], cr[11])
                inits.extend(ini)

            def w_cond(flat):
                cnd = flat[0][:, 0:1] < 128
                for i in range(1, il):
                    cnd = cnd | (flat[i * NST][:, 0:1] < 128)
                return jnp.any(cnd)

            def w_body(flat):
                outs = []
                for i in range(il):
                    # two tokens per iteration: amortizes the loop's
                    # cross-unit any() reduce over twice the work
                    sti = w_body_single(
                        i, ctxs[i], band_rp, flat[i * NST:(i + 1) * NST])
                    outs.extend(w_body_single(i, ctxs[i], band_rp, sti))
                return tuple(outs)

            flat = jax.lax.while_loop(w_cond, w_body, tuple(inits))
            new_carries = []
            new_accs = []
            for i in range(il):
                wst = flat[i * NST:(i + 1) * NST]
                new_accs.append(band_emit(i, ctxs[i], accs[i], rt_h, ph, wst))
                emitted = carries[i][8] + wst[1]
                nc = (wst[2], wst[3], wst[4], wst[5], wst[6],
                      wst[7] & POS_MASK, wst[8], wst[9], emitted)
                if liz:
                    nc = nc + (wst[11], wst[12], wst[13])
                new_carries.append(nc)
            return new_carries, new_accs

        # carries layout: 0 alive 1 cur_ll 2 cur_ml 3 cur_off 4 cur_am
        #                 5 cur_src 6 lit_p 7 flag_p 8 emitted
        #                 [9 p16 10 p24 11 last_off]
        def g_to_carry(g):
            cr = g[:8] + (g[12],)
            if liz:
                cr = cr + (g[13], g[14], g[15])
            return cr

        carries = [g_to_carry(g) for g in gs]
        for half in range(2):
            rp_h = rp + half * 512
            rp_h = jnp.where(rp_h >= ring_bytes, rp_h - ring_bytes, rp_h)
            rt_h = rp_h >> 9
            accs = [jnp.zeros((8, 128), jnp.int32) for _ in range(il)]
            for ph in range(4):
                carries, accs = one_band(ph, carries, accs, rp_h, rt_h)
            # store the accumulated tiles into the ring, flush to HBM
            @pl.when((sup + half) > 0)
            def _(rt_h=rt_h, half=half):
                rt_prev = jnp.where(rt_h == 0, rtiles - 1, rt_h - 1)
                for i in range(il):
                    pltpu.make_async_copy(
                        ring.at[pl.ds((i * rtiles + rt_prev) * 8, 8)],
                        out_hbm.at[pl.ds(
                            ((g0 + i) * T + sup + half - 1) * 8, 8)],
                        sems.at[2]).wait()
            for i in range(il):
                ring[pl.ds((i * rtiles + rt_h) * 8, 8), :] = accs[i]
            for i in range(il):
                cp = pltpu.make_async_copy(
                    ring.at[pl.ds((i * rtiles + rt_h) * 8, 8)],
                    out_hbm.at[pl.ds(((g0 + i) * T + sup + half) * 8, 8)],
                    sems.at[2])
                cp.start()

        out_gs = []
        for i in range(il):
            cr = carries[i]
            g = cr[:8] + (gs[i][8], gs[i][9], gs[i][10], gs[i][11], cr[8])
            if liz:
                g = g + (cr[9], cr[10], cr[11], gs[i][16], gs[i][17])
            out_gs.append(g)

        rp2 = rp + 1024
        rp2 = jnp.where(rp2 >= ring_bytes, rp2 - ring_bytes, rp2)
        return tuple(out_gs), rp2

    z = jnp.zeros((8, 128), jnp.int32)
    g_init = (z, z, z, z + 1, z, z, z, z, z, z, z, z, z)
    if liz:
        g_init = g_init + (z, z, z, z, z)
    st = (tuple(g_init for _ in range(il)), jnp.int32(0))
    gs_fin, rp_fin = jax.lax.fori_loop(0, T // 2, super_body, st)

    rt_last = rp_fin >> 9
    rt_prev = jnp.where(rt_last == 0, rtiles - 1, rt_last - 1)
    for i in range(il):
        pltpu.make_async_copy(
            ring.at[pl.ds((i * rtiles + rt_prev) * 8, 8)],
            out_hbm.at[pl.ds(((g0 + i) * T + T - 1) * 8, 8)],
            sems.at[2]).wait()
    for i in range(il):
        ltile[pl.ds(i * 8, 8), :] = gs_fin[i][12]
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
            pltpu.VMEM((il * NT_P * 8, 128), jnp.int32),
            pltpu.VMEM((il * NT_C * 8, 128), jnp.int32),
            pltpu.VMEM((il * of * 8, 128), jnp.int32),
            pltpu.VMEM((il * of * 8, 128), jnp.int32),
            pltpu.VMEM((il * 2 * nstr * 8, 128), jnp.int32),
            pltpu.VMEM((il * 8, 128), jnp.int32),
            pltpu.SMEM((il * 8, 2 * nstr), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
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
    <= spb*512 bytes and offsets must stay < rtiles*512 - 128. Production
    values cover 128 KB blocks with 64 KB offsets (fastLZ4) / 128 KB reach
    (LIZv1 within one inner block, e.g. -B1 independent frame blocks);
    larger LIZv1 windows (chained multi-block streams) must use the
    fallback paths."""
    from lizard_tpu.format.levels import Codewords
    if batch.codewords == Codewords.LIZv1 and batch.n_blocks:
        import numpy as _np
        counts = _np.bincount(batch.stream_id)
        if counts.max() > 1:
            # chained LIZv1 inner blocks share a window wider than the
            # in-VMEM ring (up to 16 MB, lizard_common.h:223-231); decoding
            # them here would silently mis-resolve far matches
            raise ValueError(
                "LIZv1 lane decode requires single-block streams "
                "(<= 128 KB each); use the XLA/native fallback for "
                "chained streams")
    lane = prepare_lane_batch(batch, groups=groups)
    if rtiles is None:
        rtiles = LIZ_RING_TILES if lane.family else RING_TILES
    T = lane.C * spb
    out = _lane_call(jnp.asarray(lane.pool), jnp.asarray(lane.meta),
                     C=lane.C, T=T, spb=spb, rtiles=rtiles, groups=groups,
                     il=il, family=lane.family, interpret=interpret)
    return unpack_lane_output(np.asarray(out), lane, T, spb=spb,
                              groups=groups)


def unpack_lane_output(out: np.ndarray, lane: LaneBatch, T: int,
                       spb=SUPERS_PER_BLOCK, groups=GROUPS) -> list[bytes]:
    data = out[:groups * T * 8].reshape(groups, T, 8, 128)
    lens = out[groups * T * 8:].reshape(groups, lane.C, 8, 128)[:, :, :, 0]
    # slot bytes: group g, sublane s -> rows [g, :, s, :]
    results = []
    for b, (s, cpos) in enumerate(lane.placement):
        gq, sq = divmod(s, 8)
        blk_len = int(lens[gq, cpos, sq])
        t0 = cpos * spb
        nt = (blk_len + 511) // 512
        words = data[gq, t0:t0 + nt, sq, :]
        raw = words.astype(np.int32).tobytes()  # LE words == byte order
        results.append(raw[:blk_len])
    return results


def decompress_lanes(streams: list[bytes], interpret=False,
                     spb=SUPERS_PER_BLOCK, rtiles=None,
                     groups=GROUPS, il=1) -> list[bytes]:
    """Decode independent compressed streams (either codeword family);
    returns decoded bytes per stream."""
    from lizard_tpu.ops.split import split_streams
    batch = split_streams(streams)
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
