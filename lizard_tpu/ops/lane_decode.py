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


def _gchain(win, word_idx, ntiles):
    """win (ntiles*8,128) i32: tile k rows [8k,8k+8) hold the 8 slots' words.
    word_idx (8,128) in [0, ntiles*128). Per-element gather, chain-selected."""
    sub = word_idx & 127
    t = word_idx >> 7
    r = jnp.zeros((8, 128), jnp.int32)
    for k in range(ntiles):
        g = jnp.take_along_axis(win[8 * k:8 * k + 8, :], sub, axis=1)
        r = jnp.where(t == k, g, r)
    return r


def _shl(x, n):
    return jax.lax.shift_left(x, n.astype(jnp.uint32))


def _shr(x, n):
    return jax.lax.shift_right_logical(x, n.astype(jnp.uint32))


def _funnel4(win, byte_pos, mask, ntiles):
    """uint32 of the 4 LE bytes at per-slot stream position byte_pos,
    read from a circular word window."""
    rel = byte_pos & mask
    w0 = rel >> 2
    nwords = ntiles * 128
    a = _gchain(win, w0, ntiles).astype(jnp.uint32)
    b = _gchain(win, (w0 + 1) & (nwords - 1), ntiles).astype(jnp.uint32)
    sh = ((byte_pos & 3) << 3)
    lo = _shr(a, sh)
    hi = jnp.where(sh == 0, jnp.uint32(0), _shl(b, (32 - sh) & 31))
    return lo | hi


def _byte_at(win, byte_pos, mask, ntiles):
    rel = byte_pos & mask
    w = _gchain(win, rel >> 2, ntiles).astype(jnp.uint32)
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


def _lz4_lane_kernel(C, T, spb, rtiles, groups, pool_hbm, meta_ref, out_hbm,
                     ring, pback, pfront, cback, cfront, fback, bounce,
                     ltile, trk, sems):
    g = pl.program_id(0)
    lanes = _lanes8()
    ring_bytes = rtiles * 512
    R = pool_hbm.shape[0]

    def rebuild_front(front, back, fb, nt_front, back_mask):
        """Rebuild a front window (nt_front tiles) from the backing window by
        vector gathers: front byte j == stream byte fb+j (fb: (8,128), &~511).
        Pure vector work -- no DMA, no scalar."""
        nback = (back_mask + 1) // 512
        for j in range(nt_front):
            widx = (((fb & back_mask) >> 2) + j * 128 + lanes) & \
                   (nback * 128 - 1)
            front[j * 8:(j + 1) * 8, :] = _gchain(back, widx, nback)

    def super_body(pair, st):
        sup = pair * 2
        (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src, lit_p, flag_p,
         lit_len, flag_len, lit_row0, flag_row0, emitted, rp) = st

        # ---- block transition every spb supers ----
        c = sup // spb
        at_boundary = (sup % spb) == 0

        @pl.when(at_boundary & (sup > 0))
        def _():
            ltile[:, :] = emitted
            cp = pltpu.make_async_copy(
                ltile.at[:],
                out_hbm.at[pl.ds((groups * T + (g * C + c - 1)) * 8, 8)],
                sems.at[1])
            cp.start()
            cp.wait()

        flag_row0_nxt = _meta_row(meta_ref, c, g)
        lit_row0_nxt = _meta_row(meta_ref, 2 * C + c, g)

        def do_transition(_):
            f_row0 = flag_row0_nxt
            f_len = _meta_row(meta_ref, C + c, g)
            l_row0 = lit_row0_nxt
            l_len = _meta_row(meta_ref, 3 * C + c, g)
            has = (l_len >= 0).astype(jnp.int32)
            z = jnp.zeros((8, 128), jnp.int32)
            return (has, z, z, jnp.ones((8, 128), jnp.int32), z, z, z, z,
                    jnp.maximum(l_len, 0), jnp.maximum(f_len, 0),
                    l_row0, f_row0, z)

        def no_transition(_):
            return (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src, lit_p,
                    flag_p, lit_len, flag_len, lit_row0, flag_row0, emitted)

        (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src, lit_p, flag_p,
         lit_len, flag_len, lit_row0, flag_row0, emitted) = jax.lax.cond(
            at_boundary, do_transition, no_transition, 0)

        @pl.when(at_boundary)
        def _():
            bounce[24:32, :] = lit_row0_nxt
            bounce[32:40, :] = flag_row0_nxt

            def rs(sl, k):
                trk[sl, 0] = 0
                trk[sl, 1] = 0
                trk[sl, 2] = 0
                trk[sl, 3] = bounce[24 + sl, 0]
                trk[sl, 4] = bounce[32 + sl, 0]
                return k
            jax.lax.fori_loop(0, 8, rs, 0)
            bounce[40:64, :] = jnp.zeros((24, 128), jnp.int32)

        # ---- per-super window refills (vector-decided, scalar-issued) ----
        # delta rows per slot per stream, 4 bits each, packed into one i32
        # by a row-weighted reduce; sentinel 15 = pointer jumped past the
        # backing window (scalar side re-reads the pointer from `bounce`).
        def deltas(ptr, fill, la, jr):
            frow = fill >> 9
            want = ((ptr + la) >> 9) + 1
            jump = (ptr >> 9) > frow
            d = jnp.clip(want - frow, 0, DCAP)
            d = jnp.where(jump, 15, d)
            nfill = jnp.where(jump, ((ptr >> 9) + jr) << 9,
                              jnp.maximum(fill, jnp.minimum(want, frow + d) << 9))
            return d, nfill

        JR_P = (LA_P >> 9) + 2
        JR_C = (LA_C >> 9) + 2
        JR_F = (LA_F >> 9) + 2
        csrc = cur_src & POS_MASK
        d_p, fill_p = deltas(lit_p, bounce[40:48, :], LA_P, JR_P)
        d_c, fill_c = deltas(csrc, bounce[48:56, :], LA_C, JR_C)
        d_f, fill_f = deltas(flag_p, bounce[56:64, :], LA_F, JR_F)
        bounce[40:48, :] = fill_p
        bounce[48:56, :] = fill_c
        bounce[56:64, :] = fill_f
        shmt = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 4
        lane0 = lanes == 0
        pk_p = jnp.sum(jnp.where(lane0, jax.lax.shift_left(d_p, shmt), 0))
        pk_c = jnp.sum(jnp.where(lane0, jax.lax.shift_left(d_c, shmt), 0))
        pk_f = jnp.sum(jnp.where(lane0, jax.lax.shift_left(d_f, shmt), 0))
        bounce[0:8, :] = lit_p
        bounce[8:16, :] = csrc
        bounce[16:24, :] = flag_p

        def issue(sl, win, nt, row0, f_rows, d, jr, ptr_row):
            """Issue d row-DMAs for slot sl (d==15: jump)."""
            def dojump(_):
                pr = bounce[ptr_row + sl, 0] >> 9
                return pr, pr + jr
            def nojump(_):
                return f_rows, f_rows + d
            r0, r1 = jax.lax.cond(d == 15, dojump, nojump, 0)

            def body(r, k):
                cp = pltpu.make_async_copy(
                    pool_hbm.at[pl.ds(jnp.minimum(row0 + r, R - 1), 1)],
                    win.at[pl.ds((r & (nt - 1)) * 8 + sl, 1)],
                    sems.at[0])
                cp.start()
                return k + 1
            return jax.lax.fori_loop(r0, r1, body, 0), r1

        def per_slot(sl, k):
            lr0 = trk[sl, 3]
            fr0 = trk[sl, 4]
            dp = (pk_p >> (sl * 4)) & 15
            n0, trk[sl, 0] = issue(sl, pback, NT_B, lr0, trk[sl, 0], dp,
                                   JR_P, 0)
            dc = (pk_c >> (sl * 4)) & 15
            n1, trk[sl, 1] = issue(sl, cback, NT_CB, lr0, trk[sl, 1], dc,
                                   JR_C, 8)
            df = (pk_f >> (sl * 4)) & 15
            n2, trk[sl, 2] = issue(sl, fback, NT_F, fr0, trk[sl, 2], df,
                                   JR_F, 16)
            return k + n0 + n1 + n2
        n_dma = jax.lax.fori_loop(0, 8, per_slot, 0)

        # wait for all refill DMAs at once (transfers overlap)
        def wait_one(i, k):
            pltpu.make_async_copy(
                pool_hbm.at[pl.ds(0, 1)], pback.at[pl.ds(0, 1)],
                sems.at[0]).wait()
            return k
        jax.lax.fori_loop(0, n_dma, wait_one, 0)

        def one_band(ph, carry, rp_h, rt_h):
            (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src, lit_p,
             flag_p, emitted) = carry

            band_rp = rp_h + ph * BAND
            lit_p0 = lit_p
            fb_p = lit_p & ~511
            rebuild_front(pfront, pback, fb_p, NT_P, _MASK_B)
            # carry front: normally from the carry backing; right after a
            # literal-run jump (fresh run far ahead of the carry backing)
            # the positions are still close to lit_p, so fall back to the
            # parse backing until the carry backing catches up.
            fb_c = (cur_src & POS_MASK) & ~511
            cov_c = (fb_c + NT_C * 512) <= bounce[48:56, :]
            for j in range(NT_C):
                wc = ((((fb_c & _MASK_CB) >> 2) + j * 128 + lanes)
                      & (NT_CB * 128 - 1))
                vc = _gchain(cback, wc, NT_CB)
                wp = ((((fb_c & _MASK_B) >> 2) + j * 128 + lanes)
                      & (NT_B * 128 - 1))
                vp = _gchain(pback, wp, NT_B)
                cfront[j * 8:(j + 1) * 8, :] = jnp.where(cov_c, vc, vp)
            covered = (fb_p + NT_P * 512) <= bounce[40:48, :]

            # ---------- idx build ----------
            def w_cond(st_):
                startv = st_[0]
                return jnp.any(startv[:, 0:1] < 128)

            def w_body(st_):
                (startv, fillv, alive, cur_ll, cur_ml, cur_off, cur_am,
                 cur_src, lit_p, flag_p, enc) = st_
                space = 128 - startv

                aliveb = alive != 0
                pend = (aliveb & (cur_ml == -1) & (cur_ll == 0) &
                        (space > 0) & covered)
                need = aliveb & (cur_ll == 0) & (cur_ml == 0) & (space > 0)
                exhausted = flag_p >= flag_len
                tail = need & exhausted
                fetch = need & jnp.logical_not(exhausted)

                flag = _byte_at(fback, flag_p, _MASK_F, NT_F)
                ll0 = flag & 15
                F1 = _funnel4(pfront, lit_p - fb_p, (1 << 30) - 1, NT_P)
                ev, en = _ext_from(F1)
                has_ll = ll0 == 15
                ll = jnp.where(has_ll, ev + 15, ll0)
                lp1 = lit_p + jnp.where(has_ll, en, 0)
                lp2 = lp1 + ll
                defer = lp2 > lit_p0 + DEFER_TH
                mpos = jnp.where(pend, lit_p, lp2)
                G2 = _funnel4(pfront, mpos - fb_p, (1 << 30) - 1, NT_P)
                G3 = _funnel4(pfront, mpos + 4 - fb_p, (1 << 30) - 1, NT_P)
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

                # resolve a deferred match
                cur_ml = jnp.where(pend, ml, cur_ml)
                cur_off = jnp.where(pend, jnp.maximum(off, 1), cur_off)
                lit_p = jnp.where(
                    pend, lit_p + 2 + jnp.where(has_ml, nen, 0), lit_p)
                cur_am = jnp.where(pend, 0, cur_am)

                # apply a fresh fetch
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

                # tail: remaining literal stream, then the slot is done
                tail_ll = jnp.maximum(lit_len - lit_p, 0)
                cur_ll = jnp.where(tail, tail_ll, cur_ll)
                cur_src = jnp.where(tail, lit_p, cur_src)
                lit_p = jnp.where(tail, lit_len, lit_p)
                alive = jnp.where(tail, 0, alive)

                # -- place the literal part --
                live_run = cur_ll > 0
                tl = jnp.clip(cur_ll, 0, space) * live_run
                m_l = (lanes >= startv) & (lanes < startv + tl)
                enc = jnp.where(m_l, cur_src + (lanes - startv), enc)
                cur_src = cur_src + tl
                cur_ll = cur_ll - tl
                startv = startv + tl
                space = 128 - startv

                # -- place the match part --
                live_m = (cur_ml > 0) & (cur_ll == 0)
                tm = jnp.clip(cur_ml, 0, space) * live_m
                d = jnp.clip(lanes - startv, 0, 1 << 17)
                rmod = _mod(d, cur_off)
                src_band = startv - cur_off + rmod   # nearest pre-image
                inb = src_band >= 0
                ring_idx = band_rp + src_band
                ring_idx = jnp.where(ring_idx < 0, ring_idx + ring_bytes,
                                     ring_idx)
                ring_idx = jnp.where(ring_idx >= ring_bytes,
                                     ring_idx - ring_bytes, ring_idx)
                copied = jnp.take_along_axis(
                    enc, jnp.clip(src_band, 0, 127), axis=1)
                encm = jnp.where(inb, copied, -ring_idx - 1)
                m_m = (lanes >= startv) & (lanes < startv + tm)
                enc = jnp.where(m_m, encm, enc)
                cur_ml = jnp.where(live_m, cur_ml - tm, cur_ml)
                startv = startv + tm
                fillv = fillv + tl + tm

                # a finished slot freezes; fillv keeps its true byte count
                startv = jnp.where(
                    (cur_ll == 0) & (cur_ml == 0) & (alive == 0),
                    128, startv)
                # a deferred slot whose offset is not yet resident stalls
                # for the rest of this band (its literal half fills the
                # band in the defer case, so this only fires post-jump)
                startv = jnp.where(
                    (cur_ll == 0) & (cur_ml == -1) &
                    jnp.logical_not(covered), 128, startv)
                return (startv, fillv, alive, cur_ll, cur_ml, cur_off,
                        cur_am, cur_src, lit_p, flag_p, enc)

            pend0 = (cur_ll > 0) | (cur_ml != 0) | (alive != 0)
            startv0 = jnp.where(pend0, 0, 128)
            init = (startv0, jnp.zeros((8, 128), jnp.int32), alive, cur_ll,
                    cur_ml, cur_off, cur_am,
                    cur_src | jnp.where(cur_ll > 0, CARRY_BIT, 0),
                    lit_p, flag_p,
                    jnp.zeros((8, 128), jnp.int32))
            (startv, fillv, alive, cur_ll, cur_ml, cur_off, cur_am, cur_src,
             lit_p, flag_p, enc) = jax.lax.while_loop(w_cond, w_body, init)
            cur_src = cur_src & POS_MASK
            emitted = emitted + fillv

            # ---------- band emit ----------
            is_lit = enc >= 0
            from_carry = is_lit & ((enc & CARRY_BIT) != 0)
            pos = enc & POS_MASK
            lv_p = _byte_at(pfront, pos - fb_p, (1 << 30) - 1, NT_P)
            lv_c = _byte_at(cfront, pos - fb_c, (1 << 30) - 1, NT_C)
            lv = jnp.where(from_carry, lv_c, lv_p)
            ridx = jnp.where(is_lit, 0, -enc - 1)
            rword = ridx >> 2
            rsub = rword & 127
            rtile = rword >> 7
            rv = jnp.zeros((8, 128), jnp.int32)
            for k in range(rtiles):
                gk = jnp.take_along_axis(ring[8 * k:8 * k + 8, :], rsub,
                                         axis=1)
                rv = jnp.where(rtile == k, gk, rv)
            rbyte = (_shr(rv.astype(jnp.uint32), (ridx & 3) << 3)
                     & 255).astype(jnp.int32)
            band = jnp.where(is_lit, lv & 255, rbyte)

            # ---------- pack bytes -> words, write ring quarter-tile ------
            p1 = band | _shl(pltpu.roll(band, 127, 1).astype(jnp.uint32),
                             jnp.full_like(band, 8)).astype(jnp.int32)
            p2 = p1 | _shl(pltpu.roll(p1, 126, 1).astype(jnp.uint32),
                           jnp.full_like(band, 16)).astype(jnp.int32)
            src_lane = jnp.clip((lanes - 32 * ph) * 4, 0, 127)
            words = jnp.take_along_axis(p2, src_lane, axis=1)
            cur_tile = ring[pl.ds(rt_h * 8, 8), :]
            wmask = (lanes >= 32 * ph) & (lanes < 32 * ph + 32)
            ring[pl.ds(rt_h * 8, 8), :] = jnp.where(wmask, words, cur_tile)

            return (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src,
                    lit_p, flag_p, emitted)

        carry = (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src,
                 lit_p, flag_p, emitted)
        for half in range(2):
            rp_h = rp + half * 512
            rp_h = jnp.where(rp_h >= ring_bytes, rp_h - ring_bytes, rp_h)
            rt_h = rp_h >> 9
            for ph in range(4):
                carry = one_band(ph, carry, rp_h, rt_h)
            # flush this half's ring tile (1-deep pipelined)
            @pl.when((sup + half) > 0)
            def _(rt_h=rt_h, half=half):
                rt_prev = jnp.where(rt_h == 0, rtiles - 1, rt_h - 1)
                pltpu.make_async_copy(
                    ring.at[pl.ds(rt_prev * 8, 8)],
                    out_hbm.at[pl.ds((g * T + sup + half - 1) * 8, 8)],
                    sems.at[2]).wait()
            cp = pltpu.make_async_copy(
                ring.at[pl.ds(rt_h * 8, 8)],
                out_hbm.at[pl.ds((g * T + sup + half) * 8, 8)],
                sems.at[2])
            cp.start()
        (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src, lit_p, flag_p,
         emitted) = carry

        rp2 = rp + 1024
        rp2 = jnp.where(rp2 >= ring_bytes, rp2 - ring_bytes, rp2)
        return (alive, cur_ll, cur_ml, cur_off, cur_am, cur_src, lit_p,
                flag_p, lit_len, flag_len, lit_row0, flag_row0, emitted, rp2)

    z = jnp.zeros((8, 128), jnp.int32)
    st = (z, z, z, z + 1, z, z, z, z, z, z, z, z, z, jnp.int32(0))
    st = jax.lax.fori_loop(0, T // 2, super_body, st)

    # wait for the last flush, then store the final block's decoded length
    rt_last = (st[13] >> 9)
    rt_prev = jnp.where(rt_last == 0, rtiles - 1, rt_last - 1)
    pltpu.make_async_copy(
        ring.at[pl.ds(rt_prev * 8, 8)],
        out_hbm.at[pl.ds((g * T + T - 1) * 8, 8)],
        sems.at[2]).wait()
    ltile[:, :] = st[12]
    cp = pltpu.make_async_copy(
        ltile.at[:],
        out_hbm.at[pl.ds((groups * T + (g * C + C - 1)) * 8, 8)],
        sems.at[1])
    cp.start()
    cp.wait()


@functools.partial(jax.jit, static_argnames=("C", "T", "spb", "rtiles",
                                              "groups", "interpret"))
def _lane_call(pool, meta, C, T, spb, rtiles, groups, interpret=False):
    kernel = functools.partial(_lz4_lane_kernel, C, T, spb, rtiles, groups)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(groups,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((rtiles * 8, 128), jnp.int32),
            pltpu.VMEM((NT_B * 8, 128), jnp.int32),
            pltpu.VMEM((NT_P * 8, 128), jnp.int32),
            pltpu.VMEM((NT_CB * 8, 128), jnp.int32),
            pltpu.VMEM((NT_C * 8, 128), jnp.int32),
            pltpu.VMEM((NT_F * 8, 128), jnp.int32),
            pltpu.VMEM((64, 128), jnp.int32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SMEM((8, 5), jnp.int32),
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
                       rtiles=RING_TILES, groups=GROUPS) -> list[bytes]:
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
                     interpret=interpret)
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
                     groups=GROUPS) -> list[bytes]:
    """Decode independent fastLZ4 compressed streams; returns decoded bytes
    per stream."""
    from lizard_tpu.ops.split import split_streams
    batch = split_streams(streams)
    blocks = decode_batch_lanes(batch, interpret=interpret, spb=spb,
                                rtiles=rtiles, groups=groups)
    outs = []
    i = 0
    for sid in range(int(batch.stream_id.max()) + 1 if batch.n_blocks else 0):
        parts = []
        while i < batch.n_blocks and batch.stream_id[i] == sid:
            parts.append(blocks[i])
            i += 1
        outs.append(b"".join(parts))
    return outs
