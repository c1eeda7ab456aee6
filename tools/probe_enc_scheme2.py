#!/usr/bin/env python
"""Ratio probe v2: kernel-faithful approximations for the Pallas encoder.

Beyond probe_enc_scheme.py, simulates the exact semantics the Pallas
kernel would have:
  - run-ml: match length from suffix runs of (4-byte-eq & same-offset)
    instead of exact gather-based extension (no candidate gathers).
  - sum-poison: table insert is a one-hot-matmul SUM scatter; within a
    segment, adjacent duplicate buckets are deduped (keep last) but
    non-adjacent duplicates produce a garbage entry (overwritten by the
    next insert to that bucket).
  - vis-K: table updates applied every K segments (lookup sees state
    K segments back); probe ladder covers the gap offsets.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.probe_enc_scheme import (  # noqa: E402
    N, CHUNK, MINMATCH, MFLIMIT, LASTLITERALS, LIZARD_MIN_LENGTH, SEG,
    hash4, words, cand_sort, comp_size)


def cand_segtable2(h, hashlog, K=1, poison=False):
    table = np.full(1 << hashlog, -1, np.int64)
    cand = np.full(len(h), -1, np.int64)
    pend = []
    for s0 in range(0, len(h), SEG * K):
        for q0 in range(s0, min(s0 + SEG * K, len(h)), SEG):
            seg = slice(q0, min(q0 + SEG, len(h)))
            cand[seg] = table[h[seg]]
        for q0 in range(s0, min(s0 + SEG * K, len(h)), SEG):
            seg = slice(q0, min(q0 + SEG, len(h)))
            hs = h[seg]
            ps = np.arange(seg.start, seg.stop)
            if poison:
                # adjacent-dup dedupe (keep last of each run)
                keep = np.ones(len(hs), bool)
                keep[:-1] = hs[:-1] != hs[1:]
                hk, pk = hs[keep], ps[keep]
                # non-adjacent duplicates -> garbage (position sum)
                uniq, inv, cnt = np.unique(hk, return_inverse=True,
                                           return_counts=True)
                sums = np.zeros(len(uniq), np.int64)
                np.add.at(sums, inv, pk + 1)
                val = np.where(cnt == 1, sums - 1,
                               np.minimum(sums, N - 1))  # garbage if dup
                table[uniq] = val
            else:
                table[hs] = ps
    return cand


def run_ml(u8, w, cand, n):
    """Kernel's run-based ml: suffix run of (eq4 & same offset), +3,
    capped at chunk end / n-LASTLITERALS."""
    pos = np.arange(N)
    safe = np.clip(cand, 0, N - 1)
    eq4 = (cand >= 0) & (w[safe] == w)
    d = np.where(eq4, pos - safe, -1)
    # suffix run length of same-d & eq4, not crossing chunk boundary
    R = np.zeros(N, np.int64)
    dd = d.reshape(-1, CHUNK)
    Rr = R.reshape(-1, CHUNK)
    good = (dd >= 0)
    run = np.zeros(dd.shape[0], np.int64)
    for j in range(CHUNK - 1, -1, -1):
        cont = good[:, j] & (j + 1 < CHUNK) & (dd[:, j] == dd[:, np.minimum(
            j + 1, CHUNK - 1)])
        run = np.where(good[:, j], np.where(cont, run + 1, 1), 0)
        Rr[:, j] = run
    ml = np.where(R > 0, R + 3, 0)
    ml = np.minimum(ml, CHUNK - (pos % CHUNK))
    ml = np.minimum(ml, n - LASTLITERALS - pos)
    return np.where(eq4, np.maximum(ml, 0), 0)


def comp_size_runml(u8, cand, n, min_offset=8):
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
    mlt = ml[starts]
    ends = starts + mlt
    prev_end = np.empty(len(starts), np.int64)
    if len(starts):
        prev_end[0] = 0
        prev_end[1:] = ends[:-1]
    ll = starts - prev_end
    mlx = mlt - MINMATCH

    def extn(v, thresh):
        return np.where(v >= thresh, np.where(v - thresh < 254, 1,
                        np.where(v - thresh < (1 << 16), 3, 4)), 0)

    tsz = extn(ll, 15) + ll + 2 + extn(mlx, 15)
    body = 1 + 5 * 3 + len(starts) + tsz.sum() + (
        n - (ends[-1] if len(ends) else 0))
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

    P8 = (1, 2, 3, 4, 8, 16, 32, 64)
    PL = (1, 2, 3, 4, 8, 16, 32, 64, 128, 256, 384, 512, 768, 1024)
    schemes = [
        ("sort17-exact", dict(kind="sort", hl=17, runml=False)),
        ("sort17-runml", dict(kind="sort", hl=17, runml=True)),
        ("seg15-runml", dict(kind="seg", hl=15, K=1, poison=False,
                             probes=P8, runml=True)),
        ("seg15-poison", dict(kind="seg", hl=15, K=1, poison=True,
                              probes=P8, runml=True)),
        ("seg13-poison", dict(kind="seg", hl=13, K=1, poison=True,
                              probes=P8, runml=True)),
        ("seg15-K4", dict(kind="seg", hl=15, K=4, poison=True,
                          probes=PL, runml=True)),
        ("seg15-K8", dict(kind="seg", hl=15, K=8, poison=True,
                          probes=PL, runml=True)),
        ("seg13-K4", dict(kind="seg", hl=13, K=4, poison=True,
                          probes=PL, runml=True)),
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
                cand = cand_segtable2(h, cfg["hl"], K=cfg["K"],
                                      poison=cfg["poison"])
                pos = np.arange(N)
                okc = (cand >= 0) & (w[np.clip(cand, 0, N - 1)] == w)
                best = np.where(okc, cand, -1)
                for dd in cfg["probes"]:
                    c = pos - dd
                    ok = (best < 0) & (c >= 0) & (w[np.clip(c, 0, N - 1)]
                                                  == w)
                    best = np.where(ok, c, best)
                cand = best
            tot += (comp_size_runml if cfg["runml"] else comp_size)(
                u8, cand, n)
        print(f"{name:14s} ratio={tot/len(corpus):.4f} "
              f"({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
