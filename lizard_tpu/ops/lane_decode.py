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
LA_P = 5120                  # backing lookahead bytes per refill
LA_C = 2560
LA_F = 1024
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


def _lz4_lane_kernel(C, T, spb, rtiles, groups, il, pool_hbm, meta_ref,
                     out_hbm, ring, pback, cback, fback, pfront, cfront,
                     bounce, ltile, trk, sems):
    gi = pl.program_id(0)
    g0 = gi * il
    lanes = _lanes8()
    ring_bytes = rtiles * 512
    R = pool_hbm.shape[0]
    JR_P = (LA_P >> 9) + 2
    JR_C = (LA_C >> 9) + 2
    JR_F = (LA_F >> 9) + 2
    # bounce rows per group i: i*48 + [0:8 lit_p, 8:16 csrc, 16:24 flag_p,
    #                                 24:32 fill_p, 32:40 fill_c, 40:48 fill_f]
    BPTR, BFILL = 0, 24

    def super_body(pair, st):
        sup = pair * 2
        gs, rp = st   # gs: tuple of il per-group state tuples (13 arrays)

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
            (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src, lit_p,
             flag_p, lit_len, flag_len, lit_row0, flag_row0, emitted) = gs[i]

            def do_transition(_, i=i):
                f_row0 = _meta_row(meta_ref, c, g0 + i)
                f_len = _meta_row(meta_ref, C + c, g0 + i)
                l_row0 = _meta_row(meta_ref, 2 * C + c, g0 + i)
                l_len = _meta_row(meta_ref, 3 * C + c, g0 + i)
                has = (l_len >= 0).astype(jnp.int32)
                z = jnp.zeros((8, 128), jnp.int32)
                return (has, z, z, jnp.ones((8, 128), jnp.int32), z, z, z, z,
                        jnp.maximum(l_len, 0), jnp.maximum(f_len, 0),
                        l_row0, f_row0, z)

            def no_transition(_, t=gs[i]):
                return t

            new_gs.append(jax.lax.cond(at_boundary, do_transition,
                                       no_transition, 0))
        gs = tuple(new_gs)

        @pl.when(at_boundary)
        def _():
            for i in range(il):
                bounce[pl.ds(i * 48 + BPTR, 8), :] = gs[i][10]      # lit_row0
                bounce[pl.ds(i * 48 + BPTR + 8, 8), :] = gs[i][11]  # flag_row0
                bounce[pl.ds(i * 48 + BFILL, 24), :] = jnp.zeros(
                    (24, 128), jnp.int32)

            def rs(sl, k):
                i = sl // 8
                trk[sl, 0] = 0
                trk[sl, 1] = 0
                trk[sl, 2] = 0
                trk[sl, 3] = bounce[i * 48 + BPTR + (sl & 7), 0]
                trk[sl, 4] = bounce[i * 48 + BPTR + 8 + (sl & 7), 0]
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
            lit_p, flag_p, cur_src = gs[i][6], gs[i][7], gs[i][5]
            csrc = cur_src & POS_MASK
            fp0 = bounce[i * 48 + BFILL:i * 48 + BFILL + 8, :]
            fc0 = bounce[i * 48 + BFILL + 8:i * 48 + BFILL + 16, :]
            ff0 = bounce[i * 48 + BFILL + 16:i * 48 + BFILL + 24, :]
            d_p, fill_p = deltas(lit_p, fp0, LA_P, JR_P)
            d_c, fill_c = deltas(csrc, fc0, LA_C, JR_C)
            d_f, fill_f = deltas(flag_p, ff0, LA_F, JR_F)
            bounce[i * 48 + BFILL:i * 48 + BFILL + 8, :] = fill_p
            bounce[i * 48 + BFILL + 8:i * 48 + BFILL + 16, :] = fill_c
            bounce[i * 48 + BFILL + 16:i * 48 + BFILL + 24, :] = fill_f
            bounce[i * 48 + BPTR:i * 48 + BPTR + 8, :] = lit_p
            bounce[i * 48 + BPTR + 8:i * 48 + BPTR + 16, :] = csrc
            bounce[i * 48 + BPTR + 16:i * 48 + BPTR + 24, :] = flag_p
            pks.append((
                jnp.sum(jnp.where(lane0, jax.lax.shift_left(d_p, shmt), 0)),
                jnp.sum(jnp.where(lane0, jax.lax.shift_left(d_c, shmt), 0)),
                jnp.sum(jnp.where(lane0, jax.lax.shift_left(d_f, shmt), 0))))

        def issue(sl, win, gbase, nt, row0, f_rows, d, jr, ptr_row):
            def dojump(_):
                pr = bounce[ptr_row, 0] >> 9
                return pr, pr + jr

            def nojump(_):
                return f_rows, f_rows + d
            r0, r1 = jax.lax.cond(d == 15, dojump, nojump, 0)

            def body(r, k):
                cp = pltpu.make_async_copy(
                    pool_hbm.at[pl.ds(jnp.minimum(row0 + r, R - 1), 1)],
                    win.at[pl.ds((gbase + (r & (nt - 1))) * 8 + (sl & 7), 1)],
                    sems.at[0])
                cp.start()
                return k + 1
            return jax.lax.fori_loop(r0, r1, body, 0), r1

        n_dma = jnp.int32(0)
        for i in range(il):
            pk_p, pk_c, pk_f = pks[i]

            def per_slot(s8, k, i=i, pk_p=pk_p, pk_c=pk_c, pk_f=pk_f):
                sl = i * 8 + s8
                lr0 = trk[sl, 3]
                fr0 = trk[sl, 4]
                dp = (pk_p >> (s8 * 4)) & 15
                n0, trk[sl, 0] = issue(sl, pback, i * NT_B, NT_B, lr0,
                                       trk[sl, 0], dp, JR_P,
                                       i * 48 + BPTR + s8)
                dc = (pk_c >> (s8 * 4)) & 15
                n1, trk[sl, 1] = issue(sl, cback, i * NT_CB, NT_CB, lr0,
                                       trk[sl, 1], dc, JR_C,
                                       i * 48 + BPTR + 8 + s8)
                df = (pk_f >> (s8 * 4)) & 15
                n2, trk[sl, 2] = issue(sl, fback, i * NT_F, NT_F, fr0,
                                       trk[sl, 2], df, JR_F,
                                       i * 48 + BPTR + 16 + s8)
                return k + n0 + n1 + n2
            n_dma = jax.lax.fori_loop(0, 8, per_slot, n_dma)

        def wait_one(k, x):
            pltpu.make_async_copy(
                pool_hbm.at[pl.ds(0, 1)], pback.at[pl.ds(0, 1)],
                sems.at[0]).wait()
            return x
        jax.lax.fori_loop(0, n_dma, wait_one, 0)

        # ------------------------------------------------ band machinery
        def band_prologue(i, stt):
            (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src, lit_p,
             flag_p, emitted) = stt
            fb_p = lit_p & ~511
            for j in range(NT_P):
                widx = ((((fb_p[0:8] & _MASK_B) >> 2) + j * 128 + lanes)
                        & (NT_B * 128 - 1))
                pfront[(i * NT_P + j) * 8:(i * NT_P + j) * 8 + 8, :] = \
                    _gchain(pback, i * NT_B, widx, NT_B)
            fb_c = (cur_src & POS_MASK) & ~511
            fill_c = bounce[i * 48 + BFILL + 8:i * 48 + BFILL + 16, :]
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
            fill_p = bounce[i * 48 + BFILL:i * 48 + BFILL + 8, :]
            covered = (fb_p + NT_P * 512) <= fill_p
            return fb_p, fb_c, covered

        def w_body_single(i, ctx, band_rp, stt):
            fb_p, fb_c, covered, lit_p0, lit_len, flag_len = ctx
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
            nev = jnp.where(n0 < 254, n0, jnp.where(n0 == 254, nv16, nv24))
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
                jnp.where(defer, lp2, lp2 + 2 + jnp.where(has_ml, nen, 0)),
                lit_p)
            flag_p = jnp.where(fetch, flag_p + 1, flag_p)

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
            return (startv, fillv, alive, cur_ll, cur_ml, cur_off,
                    cur_am, cur_src, lit_p, flag_p, enc)

        def band_emit(i, ctx, acc, rt_h, ph, wst):
            fb_p, fb_c, covered, lit_p0, lit_len, flag_len = ctx
            (startv, fillv, alive, cur_ll, cur_ml, cur_off, cur_am,
             cur_src, lit_p, flag_p, enc) = wst
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
                (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src, lit_p,
                 flag_p, emitted) = carries[i]
                fb_p, fb_c, covered = band_prologue(i, carries[i])
                ctxs.append((fb_p, fb_c, covered, lit_p,
                             gs[i][8], gs[i][9]))
                pend0 = (cur_ll > 0) | (cur_ml != 0) | (alive != 0)
                startv0 = jnp.where(pend0, 0, 128)
                inits.extend((
                    startv0, jnp.zeros((8, 128), jnp.int32), alive, cur_ll,
                    cur_ml, cur_off, cur_am,
                    cur_src | jnp.where(cur_ll > 0, CARRY_BIT, 0),
                    lit_p, flag_p, jnp.zeros((8, 128), jnp.int32)))

            def w_cond(flat):
                cnd = flat[0][:, 0:1] < 128
                for i in range(1, il):
                    cnd = cnd | (flat[i * _NST][:, 0:1] < 128)
                return jnp.any(cnd)

            def w_body(flat):
                outs = []
                for i in range(il):
                    # two tokens per iteration: amortizes the loop's
                    # cross-unit any() reduce over twice the work
                    sti = w_body_single(
                        i, ctxs[i], band_rp, flat[i * _NST:(i + 1) * _NST])
                    outs.extend(w_body_single(i, ctxs[i], band_rp, sti))
                return tuple(outs)

            flat = jax.lax.while_loop(w_cond, w_body, tuple(inits))
            new_carries = []
            new_accs = []
            for i in range(il):
                wst = flat[i * _NST:(i + 1) * _NST]
                new_accs.append(band_emit(i, ctxs[i], accs[i], rt_h, ph, wst))
                (startv, fillv, alive, cur_ll, cur_ml, cur_off, cur_am,
                 cur_src, lit_p, flag_p, enc) = wst
                emitted = carries[i][8] + fillv
                new_carries.append((alive, cur_ll, cur_ml, cur_off, cur_am,
                                    cur_src & POS_MASK, lit_p, flag_p,
                                    emitted))
            return new_carries, new_accs

        carries = [g[:8] + (g[12],) for g in gs]
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
            (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src, lit_p,
             flag_p, emitted) = carries[i]
            out_gs.append((alive, cur_ll, cur_ml, cur_off, cur_am, cur_src,
                           lit_p, flag_p, gs[i][8], gs[i][9], gs[i][10],
                           gs[i][11], emitted))

        rp2 = rp + 1024
        rp2 = jnp.where(rp2 >= ring_bytes, rp2 - ring_bytes, rp2)
        return tuple(out_gs), rp2

    z = jnp.zeros((8, 128), jnp.int32)
    g_init = (z, z, z, z + 1, z, z, z, z, z, z, z, z, z)
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
                                             "groups", "il", "interpret"))
def _lane_call(pool, meta, C, T, spb, rtiles, groups, il=1, interpret=False):
    kernel = functools.partial(_lz4_lane_kernel, C, T, spb, rtiles, groups,
                               il)
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
            pltpu.VMEM((il * NT_P * 8, 128), jnp.int32),
            pltpu.VMEM((il * NT_C * 8, 128), jnp.int32),
            pltpu.VMEM((il * 48, 128), jnp.int32),
            pltpu.VMEM((il * 8, 128), jnp.int32),
            pltpu.SMEM((il * 8, 5), jnp.int32),
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
    pool: np.ndarray          # (R,128) i32 word pool (flags+literals)
    meta: np.ndarray          # (4*C,128) i32: frow0 / flen / lrow0 / llen
    C: int                    # max blocks per slot
    placement: list           # block index -> (slot, chain_pos)


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

    meta = np.full((4 * C, 128), -1, np.int32)
    meta[0:2 * C] = 0
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
            placement[b] = (s, cpos)
    segs.append(np.zeros(4 * 512, np.uint8))
    cursor += 4
    pool = np.concatenate(segs).view(np.int32).reshape(cursor, 128)
    return LaneBatch(pool=pool, meta=meta, C=C, placement=placement)


def decode_batch_lanes(batch, interpret=False, spb=SUPERS_PER_BLOCK,
                       rtiles=RING_TILES, groups=GROUPS,
                       il=1) -> list[bytes]:
    """Decode a fastLZ4 BlockBatch with the lane kernel. Returns the decoded
    bytes of every block, in batch order.

    spb/rtiles/groups shrink the geometry for tests: blocks must decode to
    <= spb*512 bytes and offsets must stay < rtiles*512 - 128 (production
    values cover the real format: 128 KB blocks, 64 KB offsets)."""
    from lizard_tpu.format.levels import Codewords
    if batch.codewords != Codewords.LZ4:
        raise ValueError("lane kernel currently decodes fastLZ4 batches")
    lane = prepare_lane_batch(batch, groups=groups)
    T = lane.C * spb
    out = _lane_call(jnp.asarray(lane.pool), jnp.asarray(lane.meta),
                     C=lane.C, T=T, spb=spb, rtiles=rtiles, groups=groups,
                     il=il, interpret=interpret)
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
                     spb=SUPERS_PER_BLOCK, rtiles=RING_TILES,
                     groups=GROUPS, il=1) -> list[bytes]:
    """Decode independent fastLZ4 compressed streams; returns decoded bytes
    per stream."""
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
