#!/usr/bin/env python
"""Gap decomposition: reference-style hashChain parse (insert-all chains,
searchNum-deep FULL-length search, classic lazy, full back-extension) on
the bench corpus, with toggles to turn kernel constraints back on one at
a time. Pure host probe — measures where the ratio between our
segment-synchronized parse (~0.52) and reference -17 (0.4930) lives.

Usage: python tools/probe_enc_refparse.py [MB] [spec...]
  spec: depth,lazy,flags   flags chars: v=visible-length pick,
        s=segment-floor back-extension, n=no back-extension
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_corpus                                  # noqa: E402
from lizard_tpu.ops.enc_lanes import (EncCfg, emit_tokens,      # noqa: E402
                                      assemble_block)

MINMATCH = 4
LASTLITERALS = 16
MFLIMIT = 20
SEG = 128

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 2
data = build_corpus(MB << 20)
N = 131072
blocks = [data[i:i + N] for i in range(0, len(data), N)]
print(f"corpus {len(data)} bytes, {len(blocks)} blocks")


def parse_ref(d, depth, lazy, flags, hl=15, maxoff=65535, minoff=8):
    n = len(d)
    u8 = np.zeros(n + 8, np.uint8)
    u8[:n] = np.frombuffer(d, np.uint8)
    w8 = (u8[:n].astype(np.uint32)
          | u8[1:n + 1].astype(np.uint32) << 8
          | u8[2:n + 2].astype(np.uint32) << 16
          | u8[3:n + 3].astype(np.uint32) << 24)
    h = ((w8 * np.uint32(2654435761)) >> np.uint32(32 - hl)).astype(np.int64)
    head = np.full(1 << hl, -1, np.int64)
    nxt = np.full(n, -1, np.int64)        # chain: previous same-hash pos
    lim = n - LASTLITERALS
    last_ins = 0

    def insert_upto(p):
        nonlocal last_ins
        while last_ins < p and last_ins < n - 3:
            hh = h[last_ins]
            nxt[last_ins] = head[hh]
            head[hh] = last_ins
            last_ins += 1

    def mlen(s, c):
        # full match length, byte-exact
        x = s
        while x < lim and u8[x] == u8[x - (s - c)]:
            x += 1
        return x - s

    def search(s):
        insert_upto(s + 1)
        best_ml, best_d = 0, 0
        c = nxt[s] if h[s] == h[s] and head[h[s]] == s else head[h[s]]
        # head may be s itself (just inserted): start from its chain
        if c == s:
            c = nxt[s]
        tries = depth
        while c >= 0 and tries > 0:
            dd = s - c
            if dd > maxoff:
                break
            if dd >= minoff and w8[c] == w8[s]:
                m = mlen(s, c)
                if "v" in flags:
                    seg_end = (s // SEG) * SEG + SEG
                    vis = min(m, seg_end - s + 3)
                    bv = min(best_ml, seg_end - s + 3) if best_ml else 0
                    better = vis > bv if vis != bv else False
                    if better or (best_ml == 0 and m >= MINMATCH):
                        if m >= MINMATCH:
                            best_ml, best_d = m, dd
                else:
                    if m > best_ml and m >= MINMATCH:
                        best_ml, best_d = m, dd
            c = nxt[c]
            tries -= 1
        return best_ml, best_d

    toks = []
    s = 0
    limA = n - MFLIMIT
    while s < limA:
        ml, dd = search(s)
        if ml < MINMATCH:
            s += 1
            continue
        if lazy:
            while s + 1 < limA:
                ml2, d2 = search(s + 1)
                if ml2 >= ml + 1:       # LZ4HC-style: strictly longer
                    s, ml, dd = s + 1, ml2, d2
                else:
                    break
        # back-extension
        if "n" not in flags:
            floor = toks[-1][0] + toks[-1][1] if toks else 0
            floor = max(floor, dd)
            if "s" in flags:
                floor = max(floor, (s // SEG) * SEG)
            while s > floor and u8[s - 1] == u8[s - 1 - dd]:
                s -= 1
                ml += 1
        ml = min(ml, lim - s)
        if ml >= MINMATCH:
            toks.append((s, ml, dd))
            s += ml
        else:
            s += 1
    return toks


specs = sys.argv[2:] or ["16,1,", "16,0,", "4,1,", "64,1,", "16,1,v",
                         "16,1,s", "16,1,n"]
for spec in specs:
    parts = spec.split(",")
    depth, lazy = int(parts[0]), int(parts[1])
    flags = parts[2] if len(parts) > 2 else ""
    t0 = time.time()
    tot = 0
    ntok = 0
    for d in blocks:
        tk = parse_ref(d, depth, lazy, flags)
        if tk:
            st, ml, off = (np.array([t[j] for t in tk], np.int64)
                           for j in range(3))
        else:
            st = ml = off = np.zeros(0, np.int64)
        flg, lits = emit_tokens(d, st, ml, off)
        tot += len(assemble_block(d, flg, lits, b"", huff=False))
        ntok += len(tk)
    print(f"depth={depth:3d} lazy={lazy} flags='{flags}': ratio "
          f"{tot / len(data):.4f}  tokens {ntok}  "
          f"({time.time() - t0:.0f}s)", flush=True)
