#!/usr/bin/env python
"""Hardware ablation bench for the Pallas lane encoder (run on TPU).

Times p1 (match finder) and pass A (parse) separately and chained over
distinct 1 MB groups of the bench corpus; reports GB/s of input
consumed plus end-to-end ratio/validity through host emission.
Pallas kernels are side-effecting, so the axon execution cache never
serves them (NOTES_ROUND2.md) — still, every group is distinct data.

env: PROBE_MB (default 16), ENC_HL, ENC_MAXOFF, ENC_WHAT=p1|pA|both
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import (EncCfg, p1_call, p15_call,
                                          pA_call, pack_blocks,
                                          unpack_token_arrays,
                                          emit_tokens)
    from bench import build_corpus

    mb = int(os.environ.get("PROBE_MB", "16"))
    what = os.environ.get("ENC_WHAT", "both")
    lvl = os.environ.get("ENC_LEVEL")
    if lvl is not None:
        from lizard_tpu.ops.enc_lanes import cfg_for_level
        cfg = cfg_for_level(int(lvl))
    else:
        cfg = EncCfg(hl=int(os.environ.get("ENC_HL", "13")),
                     maxoff=int(os.environ.get("ENC_MAXOFF", "16383")),
                     lazy=os.environ.get("ENC_LAZY", "0") == "1",
                     k5=int(os.environ.get("ENC_K5", "0")),
                     chain=int(os.environ.get("ENC_CHAIN", "0")),
                     pref=int(os.environ.get("ENC_PREF", "8")))
    pa_cfg = dataclasses.replace(cfg, chain=0) if cfg.chain else cfg
    N = cfg.n
    data = build_corpus(mb << 20)
    blocks = [data[i:i + N] for i in range(0, len(data), N)]
    groups = []
    for base in range(0, len(blocks) - 7, 8):
        w32i, meta = pack_blocks(blocks[base:base + 8], cfg)
        groups.append((jnp.asarray(w32i), jnp.asarray(meta)))
    for w, m in groups:
        w.block_until_ready()
    print(f"{len(groups)} groups of 8x128K; cfg hl={cfg.hl} "
          f"maxoff={cfg.maxoff} what={what}", flush=True)

    t0 = time.time()
    pk0 = p1_call(*groups[0], cfg)
    pk0.block_until_ready()
    print(f"p1 compile+run: {time.time()-t0:.1f}s", flush=True)
    if cfg.chain:
        t0 = time.time()
        w0 = p15_call(groups[0][0], pk0, groups[0][1], cfg)
        w0.block_until_ready()
        print(f"p15 compile+run: {time.time()-t0:.1f}s", flush=True)
        pk0 = w0
    t0 = time.time()
    tok0 = pA_call(groups[0][0], pk0, groups[0][1], pa_cfg)
    tok0.block_until_ready()
    print(f"pA compile+run: {time.time()-t0:.1f}s", flush=True)

    # ---- timing over distinct groups ----
    def run_p1():
        outs = [p1_call(w, m, cfg) for (w, m) in groups]
        outs[-1].block_until_ready()
        return outs

    packs = run_p1()
    t0 = time.perf_counter()
    packs = run_p1()
    dt1 = time.perf_counter() - t0
    nbytes = len(groups) * 8 * N
    print(f"p1: {dt1*1e3:.1f} ms for {nbytes>>20} MB = "
          f"{nbytes/dt1/1e9:.3f} GB/s", flush=True)

    if cfg.chain:
        def run_p15():
            outs = [p15_call(w, pk, m, cfg)
                    for (w, m), pk in zip(groups, packs)]
            outs[-1].block_until_ready()
            return outs

        wins = run_p15()
        t0 = time.perf_counter()
        wins = run_p15()
        dt15 = time.perf_counter() - t0
        dt1 += dt15
        packs = wins
        print(f"p15: {dt15*1e3:.1f} ms = {nbytes/dt15/1e9:.3f} GB/s",
              flush=True)

    if what in ("pA", "both"):
        def run_pa():
            outs = [pA_call(w, pk, m, pa_cfg)
                    for (w, m), pk in zip(groups, packs)]
            outs[-1].block_until_ready()
            return outs

        toks = run_pa()
        t0 = time.perf_counter()
        toks = run_pa()
        dt2 = time.perf_counter() - t0
        print(f"pA: {dt2*1e3:.1f} ms = {nbytes/dt2/1e9:.3f} GB/s",
              flush=True)
        print(f"p1+pA: {nbytes/(dt1+dt2)/1e9:.3f} GB/s", flush=True)

        # ---- ratio + validity on the first 4 groups ----
        from lizard_tpu.ref.block_decode import decompress
        tot_in = tot_out = 0
        t0 = time.time()
        for g in range(min(4, len(groups))):
            arrs = unpack_token_arrays(np.asarray(toks[g]), cfg)
            for k in range(8):
                d = blocks[g * 8 + k]
                st, ml, off = arrs[k]
                flags, lits = emit_tokens(d, st, ml, off)
                from lizard_tpu.ops.enc_lanes import assemble_block
                e = assemble_block(d, flags, lits, b"")
                tot_in += len(d)
                tot_out += len(e)
                if g == 0 and k < 2:
                    assert bytes(decompress(b"\x0a" + e,
                                            max_out=len(d))) == d
        print(f"ratio={tot_out/tot_in:.4f} (emit+verify {time.time()-t0:.1f}s "
              f"host-side)", flush=True)


if __name__ == "__main__":
    main()
