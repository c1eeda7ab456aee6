#!/usr/bin/env python
"""Ratio probe for Pallas-encoder match-finding schemes (CPU, numpy).

The planned Pallas encoder cannot use the XLA encoder's global stable
sort (ops/encode_tpu.py): it processes each 128 KB block in 128-byte
SEGMENTS with a bucket table updated once per segment (insert = one-hot
MXU scatter, lookup = 4-tile gather chain), plus a fixed probe set of
small offsets for intra-segment matches. This script simulates those
exact semantics in numpy and reports the ratio delta vs the sort-based
scheme (exact nearest-previous-occurrence) on the bench corpus, for a
range of table sizes / probe sets. Run on CPU; no jax needed.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 131072
CHUNK = 128
MINMATCH = 4
MFLIMIT = 12
LASTLITERALS = 5
LIZARD_MIN_LENGTH = 13
SEG = 128


def hash4(w, hashlog):
    return ((w * np.uint32(2654435761)) >> np.uint32(32 - hashlog)).astype(
        np.int64)


def words(u8):
    u = u8.astype(np.uint32)
    return (u | np.roll(u, -1) << 8 | np.roll(u, -2) << 16
            | np.roll(u, -3) << 24)


def cand_sort(h):
    """Exact nearest previous occurrence with same hash (the XLA
    encoder's scheme): stable sort by (h, pos)."""
    pos = np.arange(len(h))
    sidx = np.lexsort((pos, h))
    hs = h[sidx]
    prev = np.roll(sidx, 1)
    same = np.empty(len(h), bool)
    same[0] = False
    same[1:] = hs[1:] == hs[:-1]
    cand_sorted = np.where(same, prev, -1)
    cand = np.empty(len(h), np.int64)
    cand[sidx] = cand_sorted
    return cand


def cand_segtable(h, hashlog, nseg_vis=1):
    """Segment-table scheme: table[bucket] = latest position, updated
    once per SEG positions; lookups in segment s see state after
    segment s-nseg_vis (nseg_vis=1 = the Pallas kernel's semantics)."""
    table = np.full(1 << hashlog, -1, np.int64)
    cand = np.full(len(h), -1, np.int64)
    pend = []
    for s0 in range(0, len(h), SEG):
        seg = slice(s0, min(s0 + SEG, len(h)))
        cand[seg] = table[h[seg]]
        pend.append(seg)
        if len(pend) >= nseg_vis:
            sg = pend.pop(0)
            table[h[sg]] = np.arange(sg.start, sg.stop)
    return cand


def probe_small(u8, w, cand, probes):
    """Intra-segment probe set: offset d wins over the table candidate
    when the table has none/fails 4-byte verify and p-d verifies.
    Prefer the table candidate if it verifies (it is usually longer)."""
    n = len(w)
    pos = np.arange(n)
    ok_tab = (cand >= 0) & (w[np.clip(cand, 0, n - 1)] == w)
    best = np.where(ok_tab, cand, -1)
    need = ~ok_tab
    for d in probes:
        c = pos - d
        ok = need & (c >= 0) & (w[np.clip(c, 0, n - 1)] == w) & (best < 0)
        best = np.where(ok, c, best)
    return best


def ext_len(u8, cand, n):
    """Common-prefix length via word-compare rounds (byte-exact)."""
    w = words(u8)
    pos = np.arange(N)
    safe = np.clip(cand, 0, N - 1)
    ml = np.full(N, MINMATCH, np.int64)
    live = cand >= 0
    extra = np.zeros(N, np.int64)
    for r in range(1, 34):
        a = w[np.minimum(pos + 4 * r, N - 1)]
        b = w[np.minimum(safe + 4 * r, N - 1)]
        x = a ^ b
        eq = (x == 0) & live
        tz = np.where(x & 0xFF == 0,
                      np.where(x & 0xFFFF == 0,
                               np.where(x & 0xFFFFFF == 0, 3, 2), 1), 0)
        extra = np.where(live & ~eq, tz, extra)
        ml = ml + np.where(eq, 4, 0)
        live = eq
    ml = ml + np.where(live, 0, extra) * (cand >= 0)
    ml = np.minimum(ml, CHUNK - (pos % CHUNK))
    ml = np.minimum(ml, n - LASTLITERALS - pos)
    return ml


def comp_size(u8, cand, n, min_offset=8):
    """Greedy chunk-parallel parse + exact fastLZ4 stream size."""
    pos = np.arange(N)
    w = words(u8)
    safe = np.clip(cand, 0, N - 1)
    off = pos - safe
    valid = ((cand >= 0) & (off >= min_offset) & (off <= 65535)
             & (w[safe] == w) & (pos < n - MFLIMIT)
             & (n >= LIZARD_MIN_LENGTH))
    cand = np.where(valid, cand, -1)
    ml = ext_len(u8, cand, n)
    has = (cand >= 0) & (ml >= MINMATCH)
    mlc = np.where(has, ml, 0).reshape(-1, CHUNK)
    p = np.zeros(N // CHUNK, np.int64)
    chosen = np.zeros((N // CHUNK, CHUNK), bool)
    for _ in range(CHUNK):
        pc = np.minimum(p, CHUNK - 1)
        m = mlc[np.arange(len(p)), pc]
        act = p < CHUNK
        hit = act & (m >= MINMATCH)
        chosen[hit, pc[hit]] = True
        p = p + np.where(hit, m, np.where(act, 1, 0))
    chosen = chosen.reshape(-1)
    starts = np.nonzero(chosen)[0]
    mlt = ml[starts]
    ends = starts + mlt
    prev_end = np.empty(len(starts), np.int64)
    prev_end[0] = 0
    prev_end[1:] = ends[:-1]
    ll = starts - prev_end
    mlx = mlt - MINMATCH

    def extn(v, thresh):
        e = np.where(v >= thresh, np.where(v - thresh < 254, 1,
                     np.where(v - thresh < (1 << 16), 3, 4)), 0)
        return e

    tsz = extn(ll, 15) + ll + 2 + extn(mlx, 15)
    body = 1 + 5 * 3 + len(starts) + tsz.sum() + (n - (ends[-1] if
                                                       len(ends) else 0))
    return body


def main():
    from lizard_tpu.utils.datagen import gen, text_like
    parts = []
    per = 4 << 20
    kinds = [lambda s: gen(per, s, proba=0.70),
             lambda s: text_like(per, s),
             lambda s: gen(per, s, proba=0.40),
             lambda s: gen(per, s, proba=0.55, lit_span=60)]
    nmb = int(os.environ.get("PROBE_MB", "8"))
    while sum(map(len, parts)) < (nmb << 20):
        parts.append(kinds[len(parts) % 4](len(parts)))
    corpus = b"".join(parts)[:nmb << 20]
    blocks = [corpus[i:i + N] for i in range(0, len(corpus), N)]
    print(f"corpus {len(corpus)>>20} MB, {len(blocks)} blocks")

    schemes = [("sort17", lambda h12, h: cand_sort(h), 17, ()),
               ("sort15", lambda h12, h: cand_sort(h), 15, ()),
               ("seg12", None, 12, (1, 2, 3, 4, 8, 16, 32, 64)),
               ("seg13", None, 13, (1, 2, 3, 4, 8, 16, 32, 64)),
               ("seg14", None, 14, (1, 2, 3, 4, 8, 16, 32, 64)),
               ("seg15", None, 15, (1, 2, 3, 4, 8, 16, 32, 64)),
               ("seg15np", None, 15, ()),
               ("seg15p4", None, 15, (1, 2, 3, 4)),
               ]
    for name, fn, hashlog, probes in schemes:
        t0 = time.time()
        tot = 0
        for blk in blocks:
            u8 = np.zeros(N, np.uint8)
            u8[:len(blk)] = np.frombuffer(blk, np.uint8)
            n = len(blk)
            w = words(u8)
            h = hash4(w, hashlog)
            if fn is not None:
                cand = cand_sort(h)
            else:
                cand = cand_segtable(h, hashlog)
                cand = probe_small(u8, w, cand, probes)
            tot += comp_size(u8, cand, n)
        print(f"{name:9s} ratio={tot/len(corpus):.4f} "
              f"({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
