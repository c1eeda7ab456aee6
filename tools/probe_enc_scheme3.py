#!/usr/bin/env python
"""Ratio probe v3: the full kernel-faithful pipeline with post-extension.

Pipeline simulated (per 128 KB block):
  1. segment table, hashlog HL, applied every K segments; inserts go
     through adjacent-dedupe then a count-matmul (duplicate buckets in a
     batch keep the OLD entry — never garbage).
  2. probe ladder for offsets the lagged table can't see.
  3. run-based approximate ml for the chunk-parallel greedy walk.
  4. EXACT extension of chosen tokens (unbounded, crosses chunks),
     capped at the next surviving token start; tokens fully swallowed by
     the extended predecessor are dropped (SWALLOW rounds).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.probe_enc_scheme import (  # noqa: E402
    N, CHUNK, MINMATCH, MFLIMIT, LASTLITERALS, LIZARD_MIN_LENGTH, SEG,
    hash4, words, cand_sort)
from tools.probe_enc_scheme2 import run_ml  # noqa: E402


def cand_segtable3(h, hashlog, K=8):
    """Lookup lag 1..K segments; inserts batched per K segments with
    adjacent-dedupe + keep-old-on-duplicate semantics."""
    table = np.full(1 << hashlog, -1, np.int64)
    cand = np.full(len(h), -1, np.int64)
    for s0 in range(0, len(h), SEG * K):
        e = min(s0 + SEG * K, len(h))
        cand[s0:e] = table[h[s0:e]]
        hs = h[s0:e]
        ps = np.arange(s0, e)
        keep = np.ones(len(hs), bool)
        keep[:-1] = hs[:-1] != hs[1:]
        hk, pk = hs[keep], ps[keep]
        uniq, inv, cnt = np.unique(hk, return_inverse=True,
                                   return_counts=True)
        last = np.zeros(len(uniq), np.int64)
        np.maximum.at(last, inv, pk)          # for reference: keep-last
        ok1 = cnt == 1
        table[uniq[ok1]] = last[ok1]          # cnt>1 -> keep old entry
    return cand


def exact_ext(u8, starts, cands, n):
    """Exact common-prefix length for chosen tokens only (vectorized
    word rounds over the token list)."""
    w = words(u8)
    L = np.full(len(starts), 0, np.int64)
    live = np.ones(len(starts), bool)
    r = 0
    while live.any() and r < (1 << 16):
        a = w[np.minimum(starts + r, N - 1)]
        b = w[np.minimum(cands + r, N - 1)]
        x = a ^ b
        eq = (x == 0) & live
        tz = np.where(x & 0xFF == 0,
                      np.where(x & 0xFFFF == 0,
                               np.where(x & 0xFFFFFF == 0, 3, 2), 1), 0)
        L = L + np.where(eq, 4, np.where(live, tz, 0))
        live = eq
        r += 4
    return np.minimum(L, n - LASTLITERALS - starts)


def comp_size_v3(u8, cand, n, min_offset=8, swallow=3):
    pos = np.arange(N)
    w = words(u8)
    safe = np.clip(cand, 0, N - 1)
    off = pos - safe
    valid = ((cand >= 0) & (off >= min_offset) & (off <= 65535)
             & (w[safe] == w) & (pos < n - MFLIMIT)
             & (n >= LIZARD_MIN_LENGTH))
    cand2 = np.where(valid, cand, -1)
    ml = run_ml(u8, w, cand2, n)
    has = (cand2 >= 0) & (ml >= MINMATCH)
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
    if not len(starts):
        return 1 + 5 * 3 + n
    mle = exact_ext(u8, starts, cand2[starts], n)

    # swallow rounds: cap at next surviving start; drop fully-covered
    alive = np.ones(len(starts), bool)
    for _ in range(swallow):
        idx = np.nonzero(alive)[0]
        st, me = starts[idx], mle[idx]
        nxt = np.empty(len(idx), np.int64)
        nxt[:-1] = st[1:]
        nxt[-1] = n
        cov = np.zeros(len(idx), bool)
        cov[1:] = st[:-1] + me[:-1] >= st[1:] + me[1:]
        if not cov.any():
            break
        alive[idx[cov]] = False
    idx = np.nonzero(alive)[0]
    st, me = starts[idx], mle[idx]
    nxt = np.empty(len(idx), np.int64)
    nxt[:-1] = st[1:]
    nxt[-1] = n - LASTLITERALS
    mlt = np.minimum(me, np.maximum(nxt - st, 0))
    keep = mlt >= MINMATCH
    st, mlt = st[keep], mlt[keep]
    if not len(st):
        return 1 + 5 * 3 + n
    ends = st + mlt
    prev_end = np.empty(len(st), np.int64)
    prev_end[0] = 0
    prev_end[1:] = ends[:-1]
    ll = st - prev_end
    mlx = mlt - MINMATCH

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

    PL = (1, 2, 3, 4, 5, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192,
          256, 384, 512, 768, 1024)
    schemes = [
        ("sort17-postx", dict(kind="sort", hl=17)),
        ("seg15-K8", dict(kind="seg", hl=15, K=8)),
        ("seg15-K4", dict(kind="seg", hl=15, K=4)),
        ("seg14-K8", dict(kind="seg", hl=14, K=8)),
        ("seg13-K8", dict(kind="seg", hl=13, K=8)),
    ]
    for name, cfg in schemes:
        t0 = time.time()
        tot = 0
        for blk in blocks:
            u8 = np.zeros(N, np.uint8)
            u8[:len(blk)] = np.frombuffer(blk, np.uint8)
            n = len(blk)
            w = words(u8)
            h = hash4(w, cfg["hl"])
            if cfg["kind"] == "sort":
                cand = cand_sort(h)
            else:
                cand = cand_segtable3(h, cfg["hl"], K=cfg["K"])
                pos = np.arange(N)
                okc = (cand >= 0) & (w[np.clip(cand, 0, N - 1)] == w)
                best = np.where(okc, cand, -1)
                for dd in PL:
                    c = pos - dd
                    ok = (best < 0) & (c >= 0) & (w[np.clip(c, 0, N - 1)]
                                                  == w)
                    best = np.where(ok, c, best)
                cand = best
            tot += comp_size_v3(u8, cand, n)
        print(f"{name:14s} ratio={tot/len(corpus):.4f} "
              f"({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
