#!/usr/bin/env python
"""Ratio sweep for the d16 hash-chain walk (EncCfg.chain) on the
bit-exact pass-A mirror, bench corpus. CPU-only (no kernel, no TPU).

Usage: python tools/probe_enc_chain.py [MB] [cfg...]
  cfg spec: k5,chain,lazy   e.g. 0,8,2
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

for spec in specs:
    ideal = exact = False
    if spec.endswith(",i"):
        ideal, spec = True, spec[:-2]
    if spec.endswith(",x"):
        exact = ideal = True
        spec = spec[:-2]
    parts = spec.split(",")
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
