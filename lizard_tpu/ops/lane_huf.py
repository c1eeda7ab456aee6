"""Lane-parallel Pallas TPU Huff0 decoder (the entropy stage of levels
30-49), re-implementing lib/entropy/huf_decompress.c's table decode as a
table-driven vector kernel (SURVEY.md §2.2 calls these out as the native
kernels to re-implement as Pallas).

Unit of parallelism: one Huff0 BITSTREAM (each HUF blob carries 4 after a
6-byte jump table, huf_compress.c:473-513). Thousands of independent
bitstreams per batch are scheduled onto slots (8 per sublane row, `il`
groups interleaved per kernel instance, like ops/lane_decode.py).

Bit semantics mirror ref/huf.py's oracle exactly: a stream is a
little-endian big integer; `pos` = payload bits remaining after stripping
the end-mark bit; every symbol looks at the top TL=11 bits (tables are
expanded to tableLog 11 on the host so lookups are uniform), emits
table_sym[v] and consumes table_nbits[v]; over-reads supply zero bits.

Measured on one v5e chip (16 MB of level-35 blobs, il=4): 0.05 GB/s of
decoded bytes, bit-exact. The per-symbol serial chain (bit-window gather ->
11-bit field -> table gather -> nbits -> next bit position) is ~160 ns and
only amortizes over 8 slots x il groups; the host C++ Huff0 decoder remains
the default for the decode pipeline (~1 GB/s/core), with this kernel as the
fully-on-TPU path. Round-2 leads: multi-symbol steps (X4-style double-symbol
tables halve the chain count) and wider interleave.

Layout tricks (rationale in lane_decode.py):
- streams are stored BYTE-REVERSED in the pool, so backward bit consumption
  becomes a forward byte pointer served by the circular backing-window +
  row-DMA refill machinery;
- each slot's current 2048-entry table lives in 16 VMEM tiles laid out
  (tile*8+slot, 128), DMA'd at task transitions; a lookup is a 16-tile lane
  gather chain;
- output is band-synchronous (1 symbol = 1 byte, so the per-band loop is a
  fixed fori(128) -- no data-dependent trip count at all); each task is
  padded to 512-byte super boundaries, so transitions happen at super
  starts, scheduled entirely scalar-side from SMEM (per-slot next-super
  counters), with per-slot state in VMEM rows (tile*8+slot) that the scalar
  core overwrites on transition.
"""

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TL = 11                       # uniform lookup width (HUF_TABLELOG_MAX)
NT_BS = 4                     # bitstream backing window tiles (2 KB)
LA_BS = 1024                  # lookahead bytes per super refill
NT_TBL = 16                   # 2048-entry table = 16 tiles
GROUPS = 16
DCAP = 14
MAX_TASKS = 30                # meta packs 4 fields x tasks into 128 lanes

_MASK_BS = NT_BS * 512 - 1

# per-slot state rows in `sst` (each state k of group i: rows
# [(i*NS + k)*8, +8), row s = slot): 0 pos, 1 written, 2 out_len,
# 3 rlen_m1, 4 fill
NS = 5


def _lanes8():
    return jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)


def _gchain(win, gbase, word_idx, ntiles):
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


def _huf_lane_kernel(T, groups, il, meta_ref, pool_hbm, tables_hbm, out_hbm,
                     bswin, tblwin, sst, acc_ref, trk, sems):
    """meta (n_slots, 128) i32: row = global slot, col = 4*c + field with
    field 0 rrow0 / 1 pos_init / 2 out_len / 3 table_row; out_len = -1 ends
    the chain. trk SMEM (il*8, 4): 0 window fill rows, 1 next-transition
    super, 2 next task index, 3 current task's pool row base."""
    gi = pl.program_id(0)
    g0 = gi * il
    lanes = _lanes8()
    R = pool_hbm.shape[0]
    RT = tables_hbm.shape[0]

    def super_body(sup, carry):
        # ---- scalar-side task transitions ----
        for i in range(il):
            def per_slot(s8, k, i=i):
                sl = i * 8 + s8

                @pl.when(trk[sl, 1] == sup)
                def _():
                    gslot = (g0 + i) * 8 + s8
                    c = trk[sl, 2]
                    olen = meta_ref[gslot, jnp.minimum(c * 4 + 2, 127)]
                    done = (olen < 0) | (c >= MAX_TASKS)

                    @pl.when(done)
                    def _():
                        trk[sl, 1] = jnp.int32(1 << 30)
                        sst[pl.ds((i * NS + 2) * 8 + s8, 1), :] = \
                            jnp.zeros((1, 128), jnp.int32)

                    @pl.when(jnp.logical_not(done))
                    def _():
                        rr0 = meta_ref[gslot, c * 4]
                        pos0 = meta_ref[gslot, c * 4 + 1]
                        trow = meta_ref[gslot, c * 4 + 3]
                        sst[pl.ds((i * NS + 0) * 8 + s8, 1), :] = \
                            jnp.full((1, 128), pos0, jnp.int32)
                        sst[pl.ds((i * NS + 1) * 8 + s8, 1), :] = \
                            jnp.zeros((1, 128), jnp.int32)
                        sst[pl.ds((i * NS + 2) * 8 + s8, 1), :] = \
                            jnp.full((1, 128), olen, jnp.int32)
                        sst[pl.ds((i * NS + 3) * 8 + s8, 1), :] = \
                            jnp.full((1, 128), ((pos0 + 8) >> 3) - 1,
                                     jnp.int32)
                        sst[pl.ds((i * NS + 4) * 8 + s8, 1), :] = \
                            jnp.zeros((1, 128), jnp.int32)
                        trk[sl, 0] = 0
                        trk[sl, 1] = sup + jnp.maximum((olen + 511) >> 9, 1)
                        trk[sl, 2] = c + 1
                        trk[sl, 3] = rr0

                        # preload the task's decode table (16 tiles)
                        def tb(r, kk):
                            cp = pltpu.make_async_copy(
                                tables_hbm.at[pl.ds(
                                    jnp.clip(trow + r, 0, RT - 1), 1)],
                                tblwin.at[pl.ds(
                                    (i * NT_TBL + r) * 8 + s8, 1)],
                                sems.at[0])
                            cp.start()
                            cp.wait()
                            return kk
                        jax.lax.fori_loop(0, NT_TBL, tb, 0)
                return k
            jax.lax.fori_loop(0, 8, per_slot, 0)

        # ---- per-super state reads + bitstream window refills ----
        shmt = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 4
        lane0 = lanes == 0
        st_i = []
        for i in range(il):
            pos = sst[(i * NS + 0) * 8:(i * NS + 0) * 8 + 8, :]
            written = sst[(i * NS + 1) * 8:(i * NS + 1) * 8 + 8, :]
            out_len = sst[(i * NS + 2) * 8:(i * NS + 2) * 8 + 8, :]
            rlen_m1 = sst[(i * NS + 3) * 8:(i * NS + 3) * 8 + 8, :]
            fill_rows = sst[(i * NS + 4) * 8:(i * NS + 4) * 8 + 8, :]
            live = written < out_len
            # forward pointer into the reversed stream
            ob_hi = jnp.maximum((pos - 1) >> 3, 0)
            ptr_r = jnp.maximum(rlen_m1 - ob_hi, 0)
            want = ((ptr_r + LA_BS) >> 9) + 1
            d = jnp.clip(want - fill_rows, 0, DCAP)
            d = jnp.where(live, d, 0)
            sst[(i * NS + 4) * 8:(i * NS + 4) * 8 + 8, :] = fill_rows + d
            pk = jnp.sum(jnp.where(lane0, jax.lax.shift_left(d, shmt), 0))

            def per_slot(s8, k, i=i, pk=pk):
                sl = i * 8 + s8
                dq = (pk >> (s8 * 4)) & 15
                f0 = trk[sl, 0]

                def body(r, kk):
                    cp = pltpu.make_async_copy(
                        pool_hbm.at[pl.ds(
                            jnp.clip(trk[sl, 3] + f0 + r, 0, R - 1), 1)],
                        bswin.at[pl.ds(
                            (i * NT_BS + ((f0 + r) & (NT_BS - 1))) * 8 + s8,
                            1)],
                        sems.at[0])
                    cp.start()
                    return kk + 1
                k = jax.lax.fori_loop(0, dq, body, k)
                trk[sl, 0] = f0 + dq
                return k
            n_dma = jax.lax.fori_loop(0, 8, per_slot, jnp.int32(0))

            def wait_one(k, x):
                pltpu.make_async_copy(
                    pool_hbm.at[pl.ds(0, 1)], bswin.at[pl.ds(0, 1)],
                    sems.at[0]).wait()
                return x
            jax.lax.fori_loop(0, n_dma, wait_one, 0)
            st_i.append((pos, written, out_len, rlen_m1, live))

        # ---- decode: 4 bands x 128 symbols per slot, all groups fused
        # into one fori so their serial bit-chains hide each other ----
        def mk_step(i, b, written, out_len, rlen_m1, live):
            def step(j, pos, acc):
                ob_hi = jnp.maximum((pos - 1) >> 3, 0)
                rb = jnp.maximum(rlen_m1 - ob_hi, 0)
                rel = rb & _MASK_BS
                w0 = rel >> 2
                a1 = _gchain(bswin, i * NT_BS, w0, NT_BS).astype(jnp.uint32)
                b1 = _gchain(bswin, i * NT_BS,
                             (w0 + 1) & (NT_BS * 128 - 1),
                             NT_BS).astype(jnp.uint32)
                sh = (rb & 3) << 3
                w = (_shr(a1, sh) |
                     jnp.where(sh == 0, jnp.uint32(0),
                               _shl(b1, (32 - sh) & 31))).astype(jnp.int32)
                v_big = (((w & 255) << 24) | (((w >> 8) & 255) << 16) |
                         (((w >> 16) & 255) << 8) | ((w >> 24) & 255))
                sh2 = jnp.clip(pos - TL - (ob_hi - 3) * 8, 0, 21)
                v = (_shr(v_big.astype(jnp.uint32), sh2)
                     & ((1 << TL) - 1)).astype(jnp.int32)
                nlow = jnp.clip(TL - pos, 0, TL)
                vmask = jnp.left_shift(jnp.full_like(v, -1), nlow)
                v = jnp.where(nlow > 0, v & vmask & ((1 << TL) - 1), v)
                v = jnp.where(pos <= 0, 0, v)
                ent = _gchain(tblwin, i * NT_TBL, v, NT_TBL)
                sym = ent & 255
                nb = (ent >> 8) & 31
                alive = live & (written + b * 128 + j < out_len)
                pos = jnp.where(alive, pos - nb, pos)
                acc = jnp.where(lanes == j, sym, acc)
                return pos, acc
            return step

        poss = [st_i[i][0] for i in range(il)]
        accs = [jnp.zeros((8, 128), jnp.int32) for _ in range(il)]
        for b in range(4):
            steps = [mk_step(i, b, st_i[i][1], st_i[i][2], st_i[i][3],
                             st_i[i][4]) for i in range(il)]

            def body(j, cc, steps=steps):
                ps = list(cc[:il])
                bs = list(cc[il:])
                for i in range(il):
                    ps[i], bs[i] = steps[i](j, ps[i], bs[i])
                return tuple(ps) + tuple(bs)

            cc = tuple(poss) + tuple(
                jnp.zeros((8, 128), jnp.int32) for _ in range(il))
            cc = jax.lax.fori_loop(0, 128, body, cc)
            poss = list(cc[:il])
            bands = list(cc[il:])
            for i in range(il):
                p1 = bands[i] | _shl(
                    pltpu.roll(bands[i], 127, 1).astype(jnp.uint32),
                    jnp.full_like(bands[i], 8)).astype(jnp.int32)
                p2 = p1 | _shl(
                    pltpu.roll(p1, 126, 1).astype(jnp.uint32),
                    jnp.full_like(bands[i], 16)).astype(jnp.int32)
                src_lane = jnp.clip((lanes - 32 * b) * 4, 0, 127)
                words = jnp.take_along_axis(p2, src_lane, axis=1)
                wmask = (lanes >= 32 * b) & (lanes < 32 * b + 32)
                accs[i] = jnp.where(wmask, words, accs[i])

        for i in range(il):
            acc_ref[pl.ds(i * 8, 8), :] = accs[i]
        for i in range(il):
            cp = pltpu.make_async_copy(
                acc_ref.at[pl.ds(i * 8, 8)],
                out_hbm.at[pl.ds(((g0 + i) * T + sup) * 8, 8)],
                sems.at[1])
            cp.start()
            cp.wait()
        for i in range(il):
            pos, written = poss[i], st_i[i][1]
            sst[(i * NS + 0) * 8:(i * NS + 0) * 8 + 8, :] = pos
            sst[(i * NS + 1) * 8:(i * NS + 1) * 8 + 8, :] = written + 512
        return carry

    # init: all slots transition at super 0
    def init_slot(sl, k):
        trk[sl, 0] = 0
        trk[sl, 1] = 0
        trk[sl, 2] = 0
        return k
    jax.lax.fori_loop(0, il * 8, init_slot, 0)
    sst[:, :] = jnp.zeros_like(sst)
    jax.lax.fori_loop(0, T, super_body, 0)


@functools.partial(jax.jit, static_argnames=("T", "groups", "il",
                                             "interpret"))
def _huf_lane_call(pool, tables, meta, T, groups, il=1, interpret=False):
    kernel = functools.partial(_huf_lane_kernel, T, groups, il)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(groups // il,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((il * NT_BS * 8, 128), jnp.int32),
            pltpu.VMEM((il * NT_TBL * 8, 128), jnp.int32),
            pltpu.VMEM((il * NS * 8, 128), jnp.int32),
            pltpu.VMEM((il * 8, 128), jnp.int32),
            pltpu.SMEM((il * 8, 4), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((groups * T * 8, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, pool, tables)


# ------------------------------------------------------------------ host

@dataclass
class HufLaneBatch:
    pool: np.ndarray           # (R,128) i32: reversed bitstream bytes
    tables: np.ndarray         # (16*n_tables,128) i32: sym | nbits<<8
    meta: np.ndarray           # (n_slots,128) i32
    T: int
    tasks: list                # per original blob: list of 4
                               # (slot, start_super, out_len) or
                               # ("host", bytes) for stored/RLE blobs


def prepare_huf_batch(blobs, groups=GROUPS):
    """blobs: list of (blob_bytes, dst_size). Builds decode tables (host,
    expanded to tableLog 11) and schedules the 4 bitstreams of every
    non-degenerate blob onto groups*8 slots."""
    from lizard_tpu.ref.huf import (HufError, huf_build_dtable,
                                    huf_read_stats)
    n_slots = groups * 8
    table_rows = []
    stream_tasks = []   # (blob_idx, seg_idx, rev_bytes, pos_init, out_len,
                        #  table_id)
    per_blob = [None] * len(blobs)
    for bi, (blob, dst_size) in enumerate(blobs):
        if len(blob) >= dst_size:
            raise HufError("not a compressed huf blob")
        if len(blob) == 1:
            per_blob[bi] = ("host", bytes([blob[0]]) * dst_size)
            continue
        weights, tl, hsize = huf_read_stats(blob)
        sym_arr, bits_arr = huf_build_dtable(weights, tl)
        sym = np.frombuffer(bytes(sym_arr), np.uint8).astype(np.int32)
        nbits = np.frombuffer(bytes(bits_arr), np.uint8).astype(np.int32)
        idx = np.arange(1 << TL) >> (TL - tl)
        table = sym[idx] | (nbits[idx] << 8)
        tid = len(table_rows)
        table_rows.append(table.reshape(16, 128))
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
        per_blob[bi] = []
        for si, (ln, n_out) in enumerate(zip((l1, l2, l3, l4), sizes)):
            sb = body[off:off + ln]
            off += ln
            if not sb or sb[-1] == 0:
                raise HufError("missing end mark")
            pos_init = (len(sb) - 1) * 8 + sb[-1].bit_length() - 1
            stream_tasks.append((bi, si, sb[::-1], pos_init, n_out, tid))

    # longest-first scheduling onto slots
    order = sorted(range(len(stream_tasks)),
                   key=lambda k: -stream_tasks[k][4])
    loads = [0] * n_slots
    slot_tasks = [[] for _ in range(n_slots)]
    for k in order:
        s = min(range(n_slots), key=lambda q: loads[q])
        slot_tasks[s].append(k)
        loads[s] += max((stream_tasks[k][4] + 511) >> 9, 1)
    T = max(1, max(loads))
    if max(len(t) for t in slot_tasks) > MAX_TASKS:
        raise HufError("too many huf streams per slot; split the batch")

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
        return r0

    meta = np.full((n_slots, 128), -1, np.int32)
    for s in range(n_slots):
        sup0 = 0
        for cpos, k in enumerate(slot_tasks[s]):
            bi, si, rev, pos_init, n_out, tid = stream_tasks[k]
            meta[s, cpos * 4] = add_seg(rev)
            meta[s, cpos * 4 + 1] = pos_init
            meta[s, cpos * 4 + 2] = n_out
            meta[s, cpos * 4 + 3] = tid * 16
            per_blob[bi].append((si, s, sup0, n_out))
            sup0 += max((n_out + 511) >> 9, 1)
    segs.append(np.zeros(4 * 512, np.uint8))
    cursor += 4
    pool = np.concatenate(segs).view(np.int32).reshape(cursor, 128)
    tables = (np.concatenate(table_rows, 0) if table_rows
              else np.zeros((16, 128), np.int32))
    # normalize per-blob task lists into segment order
    tasks = []
    for pb in per_blob:
        if isinstance(pb, tuple):
            tasks.append(pb)
        else:
            tasks.append(sorted(pb))
    return HufLaneBatch(pool=pool, tables=tables, meta=meta, T=T,
                        tasks=tasks)


def huf_decompress_lanes(blobs, groups=GROUPS, il=1,
                         interpret=False) -> list[bytes]:
    """Decode a batch of Huff0 blobs [(blob_bytes, dst_size)] on the TPU
    lane kernel; returns the decompressed bytes per blob."""
    hb = prepare_huf_batch(blobs, groups=groups)
    out = np.asarray(_huf_lane_call(
        jnp.asarray(hb.pool), jnp.asarray(hb.tables), jnp.asarray(hb.meta),
        T=hb.T, groups=groups, il=il, interpret=interpret))
    data = out.reshape(groups, hb.T, 8, 128)
    results = []
    for pb in hb.tasks:
        if isinstance(pb, tuple):
            results.append(pb[1])
            continue
        parts = []
        for si, s, sup0, n_out in pb:
            nsup = max((n_out + 511) >> 9, 1)
            words = data[s // 8, sup0:sup0 + nsup, s % 8, :]
            parts.append(words.astype(np.int32).tobytes()[:n_out])
        results.append(b"".join(parts))
    return results
