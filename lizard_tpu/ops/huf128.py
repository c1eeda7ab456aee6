"""Lane-packed Huff0 decoder: 128 bitstreams per (8,128) tile.

Second-generation TPU entropy decoder (the round-1 kernel in lane_huf.py
amortizes its serial per-symbol chain over only 8 streams/op; this one
packs 128). Two observations make it possible:

1. CANONICAL ARITHMETIC DECODE -- the X1 table of huf_decompress.c is
   rank-range structured: slots [bnd_w, bnd_{w+1}) of the 2048-entry
   table all decode weight-class w, consume nb_w = tl+1-w bits, and map
   to symbol index base_w + ((v - bnd_w) >> shift_w) in the canonical
   symbol order. A lookup therefore needs NO table gather: 10 vector
   compares classify v, one 2-plane in-lane gather fetches the class
   parameters, and the symbol RANK (not the symbol) is emitted.
   Per-stream state is a handful of broadcast planes instead of a
   16-tile table.

2. TWO-PHASE OUTPUT -- phase 1 writes rank bytes (order-preserving);
   phase 2 translates rank -> symbol with the blob's 256-entry canonical
   LUT in a separate vector pass where every (8,128) tile is blob-uniform
   (output rows are 8-row aligned per stream). This moves the only
   per-blob table dependency out of the serial loop.

Layout: stream cell (r, g) lives at sublane r, lane group g (8 lanes
each): every vector op advances 128 streams. Windows are 8 words per
stream held in the stream's own lanes (in-group lane gathers only --
axis-0 gathers are NOT native, tools/probe_transpose.py); backing is 4
row-parity tiles per lane group, refilled per super by a scalar DMA loop
fed from vector-packed counts (the lane_decode.py refill pattern).

Scheduling: cells are OVERSUBSCRIBED — each cell decodes a CHAIN of
streams cut into 8-super (4 KB output) episodes, with all transitions at
block boundaries where one DMA stages the block's metadata for every
cell (kernel docstring). This keeps occupancy high regardless of stream
length variance (the naive T = max(supers) layout measured 34% busy),
and output flushes one contiguous 4 KB DMA per cell per block instead of
eight scattered 512 B rows.

Bit semantics mirror ref/huf.py exactly (streams byte-REVERSED on the
host so backward bit consumption is a forward byte pointer, as in
lane_huf.py). Cites: lib/entropy/huf_decompress.c:111-198 (X1 table +
4-stream layout), huf_read_stats/huf_build_dtable (ref/huf.py:211-281).
"""

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TL = 11                    # uniform lookup width (tables expanded on host)
NPAR = 4                   # backing row-parity tiles per lane group
RF = 1                     # supers between backing refills (RF=2 with
                           # NPAR=8 measured SLOWER: the window rebuild
                           # pays 16*NPAR gathers per chunk, which
                           # doubles and outweighs the halved scalar
                           # refill loop)
CHUNK = 16                 # symbols per window rebuild
CPS = 32                   # chunks per super (one 512 B output row)
NMETA = 15                 # vector-meta planes per group

# vector meta plane indices
M_POS, M_RLEN, M_OLEN = 0, 1, 2
M_BND = 3                  # 10 planes: boundaries for classes 2..11
M_PA = 13                  # pk_1..pk_8 at lanes g*8+0..7
M_PB = 14                  # pk_9..pk_11 at lanes g*8+0..2


def _lanes8():
    return jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)


def _shl(x, n):
    return jax.lax.shift_left(x, n.astype(jnp.uint32))


def _shr(x, n):
    return jax.lax.shift_right_logical(x, n.astype(jnp.uint32))


def _huf128_kernel(T8, groups, il, meta_hbm, vmeta_hbm, pool_hbm, out_hbm,
                   vmeta, msblk, back, oacc, oacc8, trk, sems):
    """CELL-CHAINED layout: each of the groups*128 cells decodes a chain
    of streams back to back, cut into 8-super (4 KB output) EPISODES; all
    stream transitions happen at block boundaries, where one DMA stages
    the block's metadata for every cell (so per-cell transition logic is
    a vector select, not scalar control flow). This removes the dominant
    cost of the per-batch layout — T = max(stream supers) ran every cell
    for the longest stream's duration (measured 34% occupancy).

    meta_hbm (T8*groups*8, 128): per block/cell scalars, row
    (blk*groups+G)*8+f, lane = cell: f0 pool_row0, f1 n_rows,
    f2 out_row0 for this block (-1 = no output), f3 fresh (1 = a new
    stream starts here: pos/fill/trk reset from vmeta).
    vmeta_hbm (T8*groups*NMETA*8, 128): per-block vector planes; M_POS
    >= 0 only on fresh blocks (-1 = carry pos), M_OLEN = remaining
    output bytes of the stream at this block's start.
    back: parity tiles (il*16*NPAR*8, 128); oacc: 8 super-snapshots of
    output rows (8*il*16*8, 128); oacc8: stream-major flush staging
    (il*16*8*8, 128); trk SMEM (il*128, 1): highest pool row DMA'd."""
    gi = pl.program_id(0)
    g0 = gi * il
    lanes = _lanes8()
    lmod8 = lanes & 7
    R = pool_hbm.shape[0]
    shmt = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 4

    def vm(i, k):
        return vmeta[(i * NMETA + k) * 8:(i * NMETA + k) * 8 + 8, :]

    def one_super(kq, carry):
        """One 512 B-per-stream super: refill, symbol chunks, pack into
        the kq-th (static) snapshot of oacc. Flushing happens once per
        8-super block (see block_body)."""
        poss = carry[:il]
        fills = carry[il:]

        # ---- per-super backing refills: vector-decided, scalar-issued
        new_fills = []
        for i in range(il):
            pos, fill = poss[i], fills[i]
            rlen_m1 = vm(i, M_RLEN)
            nrows_v = (rlen_m1 + 512) >> 9
            ob_hi = jnp.maximum((pos - 1) >> 3, 0)
            rb = jnp.maximum(rlen_m1 - ob_hi, 0)
            want = jnp.minimum((rb >> 9) + 2, nrows_v - 1)
            d = jnp.clip(want - fill, 0, 3)
            new_fills.append(fill + d)
            # pack per lane-group: 8 sublanes x 4 bits
            pks = []
            for g in range(16):
                pks.append(jnp.sum(jnp.where(
                    lanes == g * 8, jax.lax.shift_left(d, shmt), 0)))

            def per_stream(sl, k, i=i, pks=pks):
                g = sl >> 3
                r = sl & 7
                dq = 0
                for gg in range(16):
                    dq = jnp.where(g == gg,
                                   (pks[gg] >> (r * 4)) & 15, dq)
                f0 = trk[sl + i * 128, 0]
                row0 = msblk[i * 8 + 0, sl]

                def body(q, kk):
                    p = q & (NPAR - 1)
                    cp = pltpu.make_async_copy(
                        pool_hbm.at[pl.ds(jnp.clip(
                            row0 + q, 0, R - 1), 1)],
                        back.at[pl.ds(
                            ((i * 16 + g) * NPAR + p) * 8 + r, 1)],
                        sems.at[0])
                    cp.start()
                    return kk + 1
                k = jax.lax.fori_loop(f0 + 1, f0 + 1 + dq, body, k)
                trk[sl + i * 128, 0] = f0 + dq
                return k
            n_dma = jax.lax.fori_loop(0, 128, per_stream,
                                      jnp.int32(0))

            def wait_one(k, x):
                pltpu.make_async_copy(
                    pool_hbm.at[pl.ds(0, 1)], back.at[pl.ds(0, 1)],
                    sems.at[0]).wait()
                return x
            jax.lax.fori_loop(0, n_dma, wait_one, 0)

        def chunk_body(c, poss):
            new_poss = []
            for i in range(il):
                pos = poss[i]
                rlen_m1 = vm(i, M_RLEN)
                out_len = vm(i, M_OLEN)
                # hoist the loop-invariant meta planes out of the symbol
                # steps (10 boundary planes + 2 packed-param planes per
                # step otherwise)
                bnds_i = [vm(i, M_BND + k) for k in range(10)]
                pa_i = vm(i, M_PA)
                pb_i = vm(i, M_PB)
                sym0 = kq * (CPS * CHUNK) + c * CHUNK   # block-local;
                # M_OLEN is the stream's REMAINING bytes at block start

                # ---- window rebuild: 8 words per stream in own lanes --
                ob_hi = jnp.maximum((pos - 1) >> 3, 0)
                rb0 = jnp.maximum(rlen_m1 - ob_hi, 0)
                wb = rb0 >> 2                    # aligned base word (glob)
                widx = wb + lmod8
                wpar = (widx >> 7) & (NPAR - 1)
                wword = widx & 127
                wtile = jnp.zeros((8, 128), jnp.int32)
                for g in range(16):
                    row0 = ((i * 16 + g) * NPAR) * 8
                    acc = jnp.zeros((8, 128), jnp.int32)
                    for p in range(NPAR):
                        t = back[row0 + p * 8:row0 + p * 8 + 8, :]
                        gth = jnp.take_along_axis(t, wword, axis=1)
                        acc = jnp.where(wpar == p, gth, acc)
                    wtile = jnp.where((lanes >> 3) == g, acc, wtile)

                # ---- CHUNK symbol steps, 2 per window read ----
                # the 32-bit stream view v_big (bytes [ob_hi-3, ob_hi])
                # always also covers the SECOND symbol's bits: its lowest
                # needed bit is pos - nb1 - TL >= pos - 22, and v_big's
                # lowest bit is 8*(ob_hi-3) <= pos - 25 (since
                # 8*ob_hi <= pos-1), so odd steps skip the gathers
                base_l = lanes & ~7
                ranks = []

                def classify(v_big, ob_hi, pos, j):
                    sh2 = jnp.clip(pos - TL - (ob_hi - 3) * 8, 0, 21)
                    v = (_shr(v_big.astype(jnp.uint32), sh2)
                         & ((1 << TL) - 1)).astype(jnp.int32)
                    nlow = jnp.clip(TL - pos, 0, TL)
                    vmask = jnp.left_shift(jnp.full_like(v, -1), nlow)
                    v = jnp.where(nlow > 0, v & vmask & ((1 << TL) - 1), v)
                    v = jnp.where(pos <= 0, 0, v)
                    wcls = jnp.full((8, 128), 1, jnp.int32)
                    for k in range(10):
                        wcls = wcls + (v >= bnds_i[k]).astype(jnp.int32)
                    # packed class params (classes 1..8 in PA, 9..11 PB)
                    ga = jnp.take_along_axis(
                        pa_i, base_l + jnp.clip(wcls - 1, 0, 7), axis=1)
                    gb = jnp.take_along_axis(
                        pb_i, base_l + jnp.clip(wcls - 9, 0, 7), axis=1)
                    pk = jnp.where(wcls <= 8, ga, gb)
                    nb = (pk >> 11) & 15
                    shf = (pk >> 15) & 15
                    rank = ((pk >> 19) & 255) + \
                        _shr((v - (pk & 2047)).astype(jnp.uint32),
                             shf).astype(jnp.int32)
                    alive = (sym0 + j < out_len) & (pos > 0)
                    pos = jnp.where(alive, pos - nb, pos)
                    ranks.append(jnp.where(alive, rank & 255, 0))
                    return pos

                for _j in range(0, CHUNK, 2):
                    ob_hi = jnp.maximum((pos - 1) >> 3, 0)
                    rb = jnp.maximum(rlen_m1 - ob_hi, 0)
                    wo = jnp.clip((rb >> 2) - wb, 0, 6)
                    ia = base_l + wo
                    a = jnp.take_along_axis(wtile, ia, axis=1
                                            ).astype(jnp.uint32)
                    b = jnp.take_along_axis(wtile, ia + 1, axis=1
                                            ).astype(jnp.uint32)
                    # pool words are byte-swapped on the host (big-endian
                    # packing), so the stream-order 32-bit view assembles
                    # with two shifts -- no per-step byte reverse
                    sh = ((rb & 3) << 3)
                    v_big = (_shl(a, sh) |
                             jnp.where(sh == 0, jnp.uint32(0),
                                       _shr(b, (32 - sh) & 31))
                             ).astype(jnp.int32)
                    pos = classify(v_big, ob_hi, pos, _j)
                    pos = classify(v_big, ob_hi, pos, _j + 1)

                # ---- pack CHUNK ranks -> 4 words -> oacc[:, 4c:4c+4) --
                ws = []
                for k in range(4):
                    ws.append(ranks[4 * k] |
                              (ranks[4 * k + 1] << 8) |
                              (ranks[4 * k + 2] << 16) |
                              _shl(ranks[4 * k + 3].astype(jnp.uint32),
                                   jnp.full((8, 128), 24, jnp.uint32)
                                   ).astype(jnp.int32))
                wall = ws[0]
                l3 = lanes & 3
                for k in range(1, 4):
                    wall = jnp.where(l3 == k, ws[k], wall)
                cmask = (lanes >> 2) == c
                for g in range(16):
                    val = jnp.take_along_axis(wall, (lanes & 3) + g * 8,
                                              axis=1)
                    row0 = (kq * il * 16 + i * 16 + g) * 8
                    cur = oacc[row0:row0 + 8, :]
                    oacc[row0:row0 + 8, :] = jnp.where(cmask, val, cur)
                new_poss.append(pos)
            return tuple(new_poss)

        poss = jax.lax.fori_loop(0, CPS, chunk_body, tuple(poss))
        return tuple(poss) + tuple(new_fills)

    def block_body(blk, carry):
        """Stage this block's metadata, handle stream transitions, run 8
        supers with static in-block indices, then one contiguous 4 KB
        flush DMA per stream."""
        cpv = pltpu.make_async_copy(
            vmeta_hbm.at[pl.ds((blk * groups + g0) * NMETA * 8,
                               il * NMETA * 8)],
            vmeta, sems.at[2])
        cpv.start()
        cpm = pltpu.make_async_copy(
            meta_hbm.at[pl.ds((blk * groups + g0) * 8, il * 8)],
            msblk, sems.at[3])
        cpm.start()
        cpv.wait()
        cpm.wait()

        # stream transitions: fresh cells load pos from vmeta and reset
        # their fill/refill trackers; continuing cells carry pos across
        # the block boundary (M_POS = -1)
        poss = list(carry[:il])
        fills = list(carry[il:])
        for i in range(il):
            vp = vm(i, M_POS)
            fresh_v = vp >= 0
            poss[i] = jnp.where(fresh_v, vp, poss[i])
            fills[i] = jnp.where(fresh_v, -1, fills[i])

        def rs(sl, k):
            for i in range(il):
                f = msblk[i * 8 + 3, sl]
                t0 = trk[sl + i * 128, 0]
                trk[sl + i * 128, 0] = jnp.where(f != 0, -1, t0)
            return k
        jax.lax.fori_loop(0, 128, rs, 0)

        carry = tuple(poss) + tuple(fills)
        for kq in range(8):
            carry = one_super(kq, carry)

        # transpose snapshots (super-major tiles, stream = sublane) into
        # oacc8 (stream-major: 8 consecutive rows per stream) with
        # value-level sublane slices — every load/store is tile-shaped
        for i in range(il):
            for g in range(16):
                ts = [oacc[(kq * il * 16 + i * 16 + g) * 8:
                           (kq * il * 16 + i * 16 + g) * 8 + 8, :]
                      for kq in range(8)]
                for r in range(8):
                    sl8 = (((i * 16 + g) * 8) + r) * 8
                    oacc8[sl8:sl8 + 8, :] = jnp.concatenate(
                        [ts[kq][r:r + 1, :] for kq in range(8)], axis=0)

        for i in range(il):
            def start_one(sl, k, i=i):
                g = sl >> 3
                r = sl & 7
                dst = msblk[i * 8 + 2, sl]
                live = dst >= 0

                @pl.when(live)
                def _():
                    cp = pltpu.make_async_copy(
                        oacc8.at[pl.ds((((i * 16 + g) * 8) + r) * 8, 8)],
                        out_hbm.at[pl.ds(jnp.maximum(dst, 0), 8)],
                        sems.at[1])
                    cp.start()
                return k + jnp.where(live, 1, 0)
            n_fl = jax.lax.fori_loop(0, 128, start_one, jnp.int32(0))

            def wait_fl(k, x, i=i):
                pltpu.make_async_copy(
                    oacc8.at[pl.ds(0, 8)], out_hbm.at[pl.ds(0, 8)],
                    sems.at[1]).wait()
                return x
            jax.lax.fori_loop(0, n_fl, wait_fl, 0)
        return carry

    def init_trk(sl, k):
        trk[sl, 0] = jnp.int32(-1)
        return k
    jax.lax.fori_loop(0, il * 128, init_trk, 0)
    z8 = jnp.zeros((8, 128), jnp.int32)
    carry = tuple(z8 for _ in range(il)) + \
        tuple(jnp.full((8, 128), -1, jnp.int32) for _ in range(il))
    jax.lax.fori_loop(0, T8, block_body, carry)


@functools.partial(jax.jit, static_argnames=("T", "groups", "il",
                                             "out_rows", "interpret"))
def _huf128_call(meta_s, vmeta, pool, T, groups, il, out_rows,
                 interpret=False):
    """T is the number of 8-super BLOCKS (episodes per cell chain)."""
    kernel = functools.partial(_huf128_kernel, T, groups, il)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(groups // il,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((il * NMETA * 8, 128), jnp.int32),
            pltpu.SMEM((il * 8, 128), jnp.int32),
            pltpu.VMEM((il * 16 * NPAR * 8, 128), jnp.int32),
            pltpu.VMEM((8 * il * 16 * 8, 128), jnp.int32),
            pltpu.VMEM((il * 16 * 8 * 8, 128), jnp.int32),
            pltpu.SMEM((il * 128, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta_s, vmeta, pool)


# phase 2: rank -> symbol translation, 64 rows (8 tiles) per grid step
TR_ROWS = 64


def _translate_kernel(meta_s, ranks, luts, out):
    pid = pl.program_id(0)

    for t in range(TR_ROWS // 8):
        ti = pid * (TR_ROWS // 8) + t
        lid = meta_s[ti >> 7, ti & 127]
        lut = luts[pl.ds(lid * 8, 8), :]     # lane j: sym[j] | sym[j+128]<<8
        tile = ranks[pl.ds(t * 8, 8), :]
        res = jnp.zeros((8, 128), jnp.int32)
        for byte in range(4):
            rk = (tile >> (8 * byte)) & 255
            g = jnp.take_along_axis(lut, rk & 127, axis=1)
            sym = jnp.where(rk < 128, g & 255, (g >> 8) & 255)
            res = res | (sym << (8 * byte))
        out[pl.ds(t * 8, 8), :] = res


@functools.partial(jax.jit, static_argnames=("interpret",))
def _translate_call(meta_s, ranks, luts, interpret=False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ranks.shape[0] // TR_ROWS,),
        in_specs=[
            pl.BlockSpec((TR_ROWS, 128), lambda g, *_: (g, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR_ROWS, 128), lambda g, *_: (g, 0)),
    )
    return pl.pallas_call(
        _translate_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(ranks.shape, jnp.int32),
        interpret=interpret,
    )(meta_s, ranks, luts)


# ------------------------------------------------------------------ host

@dataclass
class Huf128Batch:
    meta_s: np.ndarray       # (T8*groups*8, 128) i32 per-block scalars
    vmeta: np.ndarray        # (T8*groups*NMETA*8, 128) i32 per-block
    pool: np.ndarray         # (R, 128) i32 byte-reversed streams
    luts: np.ndarray         # (nblobs*8, 128) i32 sym | sym128<<8
    tmeta: np.ndarray        # (rows,128) i32 LUT id per 8-row out tile
    T: int                   # episodes (8-super blocks) per cell chain
    groups: int
    out_rows: int
    tasks: list


def _class_params(weights, tl):
    """Canonical class boundaries/params in TL-expanded slot space + the
    canonical symbol order (same fill as huf_build_dtable)."""
    rank_count = [0] * (TL + 2)
    for w in weights:
        rank_count[w] += 1
    scale = TL - tl
    bnd = [1 << TL] * (TL + 2)
    start = 0
    for w in range(1, tl + 1):
        bnd[w] = start
        start += (rank_count[w] << (w - 1)) << scale
    syms = []
    base = [0] * (TL + 2)
    for w in range(1, tl + 1):
        base[w] = len(syms)
        for s, ww in enumerate(weights):
            if ww == w:
                syms.append(s)
    pks = []
    for w in range(1, TL + 1):
        if w <= tl:
            nb = tl + 1 - w
            shift = w - 1 + scale
            b = base[w]
            sv = bnd[w]
        else:
            nb, shift, b, sv = 0, 0, 0, 0
        pks.append((sv & 2047) | (nb << 11) | (shift << 15)
                   | (min(b, 255) << 19))
    bnds = [min(bnd[w], (1 << TL)) for w in range(2, TL + 1)]
    return bnds, pks, syms


def prepare_huf128(blobs, groups=8):
    """blobs: [(blob_bytes, dst_size)] -> Huf128Batch. One stream per
    cell; longest-first assignment; output rows 8-aligned per stream so
    translate tiles are blob-uniform."""
    from lizard_tpu.ref.huf import HufError, huf_read_stats
    n_cells = groups * 128
    tasks = [None] * len(blobs)
    stream_list = []
    luts = []
    for bi, (blob, dst_size) in enumerate(blobs):
        if len(blob) >= dst_size:
            raise HufError("not a compressed huf blob")
        if len(blob) == 1:
            tasks[bi] = ("host", bytes([blob[0]]) * dst_size)
            continue
        weights, tl, hsize = huf_read_stats(blob)
        if tl > TL:
            raise HufError("tableLog > 11 unsupported on this path")
        bnds, pks, syms = _class_params(weights, tl)
        lut = np.zeros(256, np.int32)
        lut[:len(syms)] = syms
        lrow = np.broadcast_to(lut[:128] | (lut[128:] << 8),
                               (8, 128)).astype(np.int32)
        luts.append(lrow)
        lid = len(luts) - 1
        body = blob[hsize:]
        l1 = body[0] | (body[1] << 8)
        l2 = body[2] | (body[3] << 8)
        l3 = body[4] | (body[5] << 8)
        l4 = len(body) - 6 - l1 - l2 - l3
        if l4 <= 0:
            raise HufError("bad jump table")
        seg = (dst_size + 3) // 4
        sizes = [seg, seg, seg, dst_size - 3 * seg]
        off = 6
        tasks[bi] = []
        for si, (ln, n_out) in enumerate(zip((l1, l2, l3, l4), sizes)):
            sb = body[off:off + ln]
            off += ln
            if not sb or sb[-1] == 0:
                raise HufError("missing end mark")
            if n_out <= 0:
                raise HufError("empty huf segment")
            pos_init = (len(sb) - 1) * 8 + sb[-1].bit_length() - 1
            stream_list.append((bi, si, sb[::-1], pos_init, n_out,
                                bnds, pks, lid))
    # ---- cell-chained schedule: streams cut into 8-super EPISODES,
    # longest-first onto least-loaded cells; every cell runs T8 episodes
    # and all stream transitions happen at episode boundaries
    eps = [max((s[4] + 4095) >> 12, 1) for s in stream_list]
    order = sorted(range(len(stream_list)), key=lambda k: -eps[k])
    import heapq
    heap = [(0, c) for c in range(n_cells)]
    cell_streams = [[] for _ in range(n_cells)]
    loads = [0] * n_cells
    for k in order:
        load, c = heapq.heappop(heap)
        cell_streams[c].append(k)
        loads[c] = load + eps[k]
        heapq.heappush(heap, (loads[c], c))
    T8 = max(1, max(loads))

    meta = np.zeros((T8, groups, 8, 128), np.int32)
    meta[:, :, 2, :] = -1                    # out_row0: -1 = no output
    vmeta = np.zeros((T8, groups, NMETA, 8, 128), np.int32)
    vmeta[:, :, M_POS] = -1                  # pos: -1 = carry (or dead)
    segs = []
    cursor = 0

    def add_seg(arr):
        nonlocal cursor
        rows = max(1, (len(arr) + 511) // 512)
        a = np.zeros(rows * 512, np.uint8)
        a[:len(arr)] = np.frombuffer(bytes(arr), np.uint8)
        segs.append(a)
        r0 = cursor
        cursor += rows
        return r0, rows

    out_cursor = 0
    tmeta_rows = []
    for cell in range(n_cells):
        G = cell // 128
        g = (cell % 128) // 8
        r = (cell % 128) % 8
        lane = cell % 128
        lanes8 = slice(g * 8, g * 8 + 8)
        blk = 0
        for k in cell_streams[cell]:
            bi, si, rev, pos_init, n_out, bnds, pks, lid = stream_list[k]
            rr0, nrows = add_seg(rev)
            # 8-row-padded output region: the kernel flushes one 8-row
            # (4 KB) contiguous DMA per cell per episode, so a stream's
            # final partial episode writes junk into its own padding
            # (never a neighbour); translate tiles stay blob-uniform
            tasks[bi].append((si, out_cursor, n_out))
            tmeta_rows.extend([lid] * eps[k])
            for b in range(eps[k]):
                meta[blk + b, G, 0, lane] = rr0
                meta[blk + b, G, 1, lane] = nrows
                meta[blk + b, G, 2, lane] = out_cursor + b * 8
                meta[blk + b, G, 3, lane] = 1 if b == 0 else 0
                vmeta[blk + b, G, M_POS, r, lanes8] = \
                    pos_init if b == 0 else -1
                vmeta[blk + b, G, M_RLEN, r, lanes8] = len(rev) - 1
                vmeta[blk + b, G, M_OLEN, r, lanes8] = n_out - b * 4096
                for kk in range(10):
                    vmeta[blk + b, G, M_BND + kk, r, lanes8] = bnds[kk]
                for kk in range(8):
                    vmeta[blk + b, G, M_PA, r, g * 8 + kk] = pks[kk]
                for kk in range(3):
                    vmeta[blk + b, G, M_PB, r, g * 8 + kk] = pks[8 + kk]
            blk += eps[k]
            out_cursor += eps[k] * 8

    # +8 before aligning: >=8 guard rows past the last real output row so
    # the fused compact kernel's 8-row staged-run DMAs (ops/fuse.py) can
    # never read past the translate output
    out_cursor = (out_cursor + 8 + TR_ROWS - 1) & ~(TR_ROWS - 1)
    while len(tmeta_rows) < out_cursor // 8:
        tmeta_rows.append(0)
    assert len(tmeta_rows) == out_cursor // 8

    segs.append(np.zeros(512, np.uint8))
    cursor += 1
    # byte-swap each 32-bit word (big-endian packing): the kernel's
    # symbol step then assembles the stream-order view with two shifts
    # instead of a per-step byte reverse
    pool = (np.concatenate(segs).reshape(-1, 4)[:, ::-1]
            .reshape(-1).copy().view(np.int32).reshape(cursor, 128))
    luts_arr = (np.concatenate(luts, 0) if luts
                else np.zeros((8, 128), np.int32))
    tr = np.zeros(((len(tmeta_rows) + 127) // 128) * 128, np.int32)
    tr[:len(tmeta_rows)] = tmeta_rows
    tmeta = tr.reshape(-1, 128)
    return Huf128Batch(meta_s=meta.reshape(-1, 128),
                       vmeta=vmeta.reshape(-1, 128),
                       pool=pool, luts=luts_arr, tmeta=tmeta,
                       T=T8, groups=groups, out_rows=out_cursor,
                       tasks=tasks)


def pick_groups(n_streams: int) -> int:
    """Cells should be OVERSUBSCRIBED ~3-4x so cell chains stay busy:
    idle cells still pay every super (throughput scales with busy
    cells/super, measured il4 == il8 at equal totals)."""
    return min(8, max(1, n_streams // 384))


def huf_decompress_128(blobs, groups=None, il=None, interpret=False):
    """Decode a batch of Huff0 blobs [(blob, dst_size)] -> [bytes]."""
    if groups is None:
        groups = pick_groups(4 * len(blobs))
    if il is None:
        il = groups
    hb = prepare_huf128(blobs, groups=groups)
    if hb.out_rows == 0:       # all-RLE batch: nothing for the kernel
        return [pb[1] for pb in hb.tasks]
    ranks = _huf128_call(jnp.asarray(hb.meta_s), jnp.asarray(hb.vmeta),
                         jnp.asarray(hb.pool), T=hb.T, groups=hb.groups,
                         il=il, out_rows=hb.out_rows, interpret=interpret)
    syms = _translate_call(jnp.asarray(hb.tmeta), ranks,
                           jnp.asarray(hb.luts), interpret=interpret)
    flat = np.asarray(syms).astype(np.int32).tobytes()
    results = []
    for pb in hb.tasks:
        if isinstance(pb, tuple):
            results.append(pb[1])
            continue
        parts = []
        for si, row0, n_out in sorted(pb):
            parts.append(flat[row0 * 512: row0 * 512 + n_out])
        results.append(b"".join(parts))
    return results
