#!/usr/bin/env python
"""Ratio sweep for the d16 hash-chain walk (EncCfg.chain) on the
bit-exact mirrors, bench corpus. CPU-only (no kernel, no TPU).

Plain chain specs run the PRODUCT semantics (phase-1.5 prefix-ranked
pre-pick inside p2_reference). Flags override/augment:
  i = ideal delta (insert-all DELTANEXT ceiling)
  x = + exact-nearest map 0 (perfect phase-1 coverage ceiling)
  pK = local prefix_walk_pick with ranking depth K (e.g. p16)
  d = pK variant that also walks from the position's own unverified
      delta entry when map 0 is empty

Usage: python tools/probe_enc_chain.py [MB] [cfg...]
  cfg spec: k5,chain,lazy[,hl][,flags...]   e.g. 0,32,2,15 or 2,16,2,16,p16,d
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_corpus                                  # noqa: E402
from lizard_tpu.ops.enc_lanes import (EncCfg, p1_reference,     # noqa: E402
                                      p2_reference, emit_tokens,
                                      assemble_block)

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 16
data = build_corpus(MB << 20)
N = 131072
blocks = [data[i:i + N] for i in range(0, len(data), N)]
print(f"corpus {len(data)} bytes, {len(blocks)} blocks")

specs = sys.argv[2:] or ["0,0,2", "0,2,2", "0,4,2", "0,8,2", "0,16,2",
                         "2,0,2", "2,4,2", "4,0,2", "4,4,2"]

def ideal_delta(d, cfg):
    """Ceiling probe: delta over ALL positions (reference DELTANEXT),
    ignoring the kernel's segment-batched insert losses."""
    n = len(d)
    u8 = np.zeros(cfg.n + 4, np.uint8)
    u8[:n] = np.frombuffer(d, np.uint8)
    w8 = (u8[:cfg.n].astype(np.uint32)
          | u8[1:cfg.n + 1].astype(np.uint32) << 8
          | u8[2:cfg.n + 2].astype(np.uint32) << 16
          | u8[3:cfg.n + 3].astype(np.uint32) << 24)
    h = ((w8 * np.uint32(2654435761)) >> np.uint32(32 - cfg.hl))
    order = np.lexsort((np.arange(cfg.n), h))
    hs = h[order]
    dlt = np.zeros(cfg.n, np.int64)
    same = hs[1:] == hs[:-1]
    dv = order[1:] - order[:-1]
    tgt = order[1:]
    ok = same & (dv > 0) & (dv < (1 << 16))
    dlt[tgt[ok]] = dv[ok]
    return dlt


def exact_nearest(d, cfg):
    """Ceiling probe: per position, the distance to the nearest previous
    EQUAL-WORD occurrence (d in [min_offset, maxoff]), i.e. perfect
    phase-1 coverage."""
    n = len(d)
    u8 = np.zeros(cfg.n + 4, np.uint8)
    u8[:n] = np.frombuffer(d, np.uint8)
    w8 = (u8[:cfg.n].astype(np.uint32)
          | u8[1:cfg.n + 1].astype(np.uint32) << 8
          | u8[2:cfg.n + 2].astype(np.uint32) << 16
          | u8[3:cfg.n + 3].astype(np.uint32) << 24)
    order = np.lexsort((np.arange(cfg.n), w8))
    ws = w8[order]
    cand = np.zeros(cfg.n, np.int64)
    same = ws[1:] == ws[:-1]
    dv = order[1:] - order[:-1]
    ok = same & (dv >= cfg.min_offset) & (dv <= cfg.maxoff)
    cand[order[1:][ok]] = dv[ok]
    cand[n - MFLIMIT:] = 0
    return cand


MFLIMIT = 20

def prefix_walk_pick(d, cand, delta, cfg, K, dstart=False):
    """Vectorized phase-1.5 model: walk the delta chain per POSITION
    (not per token), rank nodes by matched-prefix length capped at K
    bytes (>=4 to qualify; strictly-longer wins, so the nearest node
    wins ties), return the single winner-distance map. This is what a
    lane kernel could do in parallel vector code, moving the chain cost
    out of the serial pass-A walk."""
    n = len(d)
    u8 = np.zeros(cfg.n + K + 4, np.uint8)
    u8[:n] = np.frombuffer(d, np.uint8)
    pos = np.arange(cfg.n)

    def plen(dist):
        """Matched-prefix length (capped K) of pos vs pos-dist."""
        src = pos - dist
        ok = (dist > 0) & (src >= 0)
        srcc = np.maximum(src, 0)
        m = ok.copy()
        ln = np.zeros(cfg.n, np.int64)
        for j in range(K):
            m &= (pos + j < n) & (u8[srcc + j] == u8[pos + j])
            ln += m
        return ln

    best_d = np.where(cand > 0, cand, 0).astype(np.int64)
    best_l = plen(best_d)
    if dstart:
        # no verified map-0 candidate: start the walk from the
        # position's own (unverified) delta entry — same bucket, may
        # rank >= 4 at some node even though the head failed verify
        start = np.where((cand > 0) | (delta <= 0), best_d, delta)
        nb = ((cand <= 0) & (delta >= cfg.min_offset)
              & (delta <= cfg.maxoff))
        ln0 = plen(np.where(nb, delta, 0))
        upg = nb & (ln0 >= 4)
        best_d = np.where(upg, delta, best_d)
        best_l = np.where(upg, ln0, best_l)
        cur = start
        walking = start > 0
    else:
        cur = best_d.copy()
        walking = cand > 0
    for _ in range(int(cfg.chain)):
        if not walking.any():
            break
        nd = np.where(walking, delta[np.maximum(pos - cur, 0)], 0)
        cur2 = cur + nd
        valid = walking & (nd > 0) & (cur2 <= cfg.maxoff)
        ln = plen(np.where(valid, cur2, 0))
        take = valid & (ln >= 4) & (ln > best_l)
        best_d = np.where(take, cur2, best_d)
        best_l = np.where(take, ln, best_l)
        cur = np.where(valid, cur2, cur)
        walking = valid
    return best_d


for spec in specs:
    ideal = exact = dstart = False
    prefk = 0
    parts = spec.split(",")
    while parts and parts[-1][:1].isalpha():
        f = parts.pop()
        if f == "i":
            ideal = True
        elif f == "x":
            exact = ideal = True
        elif f == "d":
            dstart = True
        elif f.startswith("p"):
            prefk = int(f[1:])
    k5, chain, lazy = (int(x) for x in parts[:3])
    hl = int(parts[3]) if len(parts) > 3 else 13
    cfg = EncCfg(maxoff=65535, lazy=lazy, k5=k5, chain=chain, hl=hl)
    t0 = time.time()
    tot = 0
    ntok = 0
    for g0 in range(0, len(blocks), 8):
        grp = blocks[g0:g0 + 8]
        dmap, _ = p1_reference(grp, cfg)
        if ideal and chain:
            for b, d in enumerate(grp):
                dmap[b][-1] = ideal_delta(d, cfg)
                if exact:
                    dmap[b][0] = exact_nearest(d, cfg)
        if prefk and chain:
            # phase-1.5 model: pre-pick the chain winner per position,
            # hand pass A a chain-free single-candidate map set
            import dataclasses
            cfg2 = dataclasses.replace(cfg, chain=0)
            dmap2 = []
            for b, d in enumerate(grp):
                win = prefix_walk_pick(d, dmap[b][0], dmap[b][-1],
                                       cfg, prefk, dstart=dstart)
                maps = [win] + [dmap[b][1 + j] for j in range(k5)]
                dmap2.append(np.stack(maps) if cfg2.nmaps > 1 else win)
            toks = p2_reference(grp, cfg2, dmap=dmap2)
        else:
            toks = p2_reference(grp, cfg, dmap=dmap)
        for d, tk in zip(grp, toks):
            if tk:
                st, ml, off = (np.array([t[j] for t in tk], np.int64)
                               for j in range(3))
            else:
                st = ml = off = np.zeros(0, np.int64)
            flags, lits = emit_tokens(d, st, ml, off)
            tot += len(assemble_block(d, flags, lits, b"", huff=False))
            ntok += len(tk)
    dt = time.time() - t0
    print(f"k5={k5} chain={chain:2d} lazy={lazy}: ratio "
          f"{tot / len(data):.4f}  tokens {ntok}  ({dt:.0f}s)", flush=True)
