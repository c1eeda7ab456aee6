#!/usr/bin/env python
"""Ratio probe v4: the boundary-carry greedy (final phase-2 semantics).

Serial over 128-byte segments (matching the Pallas pass-A loop):
  - run-ml within the segment (coherent-d suffix runs, +3, capped at
    the boundary),
  - greedy walk from s0 (positions consumed by a carried match),
  - a token whose run hits the segment boundary becomes PENDING: each
    later segment computes eq4 against the carried d (exact data
    compare) and extends it by the head run, until the run breaks or
    the block ends.  This reproduces the reference's unbounded greedy
    for boundary-crossing matches at one extra funnel per segment.
Optionally one d-smoothing round (adopt the left neighbor's offset when
it also 4-byte-verifies) before run-ml.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.probe_enc_scheme import N, hash4, words  # noqa: E402
from tools.probe_enc_scheme3 import cand_segtable3  # noqa: E402

SEG = 128
MINMATCH = 4
LASTLITERALS = 5
MFLIMIT = 12


def parse_carry(u8, cand, n, smooth=0):
    """Returns token list (st, ml, off) with boundary-carry greedy."""
    w = words(u8)
    pos = np.arange(N)
    valid = cand >= 0
    d = np.where(valid, pos - cand, -1)
    if smooth:
        for _ in range(smooth):
            dprev = np.empty(N, np.int64)
            dprev[0] = -1
            dprev[1:] = d[:-1]
            cs = pos - dprev
            ok = ((dprev > 0) & (cs >= 0) & (~valid)
                  & (w[np.clip(cs, 0, N - 1)] == w))
            d = np.where(ok, dprev, d)
            valid = valid | ok
        cand = np.where(valid, pos - d, -1)

    toks = []
    pend = None                    # (st, d, me)
    lim = n - LASTLITERALS
    for s0 in range(0, n, SEG):
        seg_end = min(s0 + SEG, n)
        L = seg_end - s0
        ds = d[s0:seg_end]
        vs = valid[s0:seg_end]
        start = 0
        if pend is not None:
            st_p, d_p, me = pend
            x = np.arange(s0, seg_end)
            eq = (w[np.clip(x - d_p, 0, N - 1)] == w[x]) & (x < lim)
            head = 0
            while head < L and eq[head]:
                head += 1
            me += head
            if head < L or seg_end >= n:
                me = min(me, lim - st_p)
                toks.append((st_p, me, d_p))
                pend = None
                start = head
            else:
                continue            # whole segment consumed
        # run-ml within segment
        run = np.zeros(L + 1, np.int64)
        for j in range(L - 1, -1, -1):
            if vs[j]:
                run[j] = 1 + (run[j + 1]
                              if (j + 1 < L and vs[j + 1]
                                  and ds[j + 1] == ds[j]) else 0)
        ml = np.where(vs, run[:L] + 3, 0)
        ml = np.minimum(ml, L - np.arange(L))
        ml = np.minimum(ml, lim - (s0 + np.arange(L)))
        j = start
        while j < L:
            if vs[j] and ml[j] >= MINMATCH:
                if j + ml[j] >= L and seg_end < n:
                    pend = (s0 + j, ds[j], ml[j])   # crosses boundary
                    j = L
                else:
                    toks.append((s0 + j, int(ml[j]), int(ds[j])))
                    j += int(ml[j])
            else:
                j += 1
    if pend is not None:
        st_p, d_p, me = pend
        toks.append((st_p, min(me, lim - st_p), d_p))
    return toks


def comp_size_toks(toks, n):
    if not toks:
        return 1 + 5 * 3 + n
    st = np.array([t[0] for t in toks])
    ml = np.array([t[1] for t in toks])
    keep = ml >= MINMATCH
    st, ml = st[keep], ml[keep]
    if not len(st):
        return 1 + 5 * 3 + n
    ends = st + ml
    prev_end = np.empty(len(st), np.int64)
    prev_end[0] = 0
    prev_end[1:] = ends[:-1]
    ll = st - prev_end
    mlx = ml - MINMATCH

    def extn(v, thresh):
        return np.where(v >= thresh, np.where(v - thresh < 254, 1,
                        np.where(v - thresh < (1 << 16), 3, 4)), 0)

    tsz = extn(ll, 15) + ll + 2 + extn(mlx, 15)
    return 1 + 5 * 3 + len(st) + tsz.sum() + (n - ends[-1])


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

    PL = (8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768,
          1024)
    for name, hl, maxoff, smooth in (
            ("hl13-16k-s0", 13, 16383, 0),
            ("hl13-16k-s1", 13, 16383, 1),
            ("hl13-16k-s2", 13, 16383, 2),
            ("hl14-16k-s1", 14, 16383, 1),
            ("hl13-64k-s1", 13, 65535, 1)):
        t0 = time.time()
        tot = 0
        for blk in blocks:
            u8 = np.zeros(N, np.uint8)
            u8[:len(blk)] = np.frombuffer(blk, np.uint8)
            n = len(blk)
            w = words(u8)
            h = hash4(w, hl)
            cand = cand_segtable3(h, hl, K=1)
            pos = np.arange(N)
            okc = ((cand >= 0) & (w[np.clip(cand, 0, N - 1)] == w)
                   & (pos - cand <= maxoff) & (pos - cand >= 8)
                   & (pos < n - MFLIMIT) & (n >= 13))
            best = np.where(okc, cand, -1)
            for dd in PL:
                c = pos - dd
                ok = ((best < 0) & (c >= 0) & (pos < n - MFLIMIT)
                      & (n >= 13) & (w[np.clip(c, 0, N - 1)] == w))
                best = np.where(ok, c, best)
            toks = parse_carry(u8, best, n, smooth=smooth)
            tot += comp_size_toks(toks, n)
        print(f"{name}: ratio={tot/len(corpus):.4f} ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
