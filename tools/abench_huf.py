#!/usr/bin/env python
"""Micro-bench of the lane-packed Huff0 decode kernel (ops/huf128.py).

Builds one batch of Huff0 blobs (the flags+literals streams the Huffman
levels produce), then times _huf128_call + _translate_call fastest-of-N.
Pallas kernels are side-effecting and never served from the axon
execution cache, so a plain timing loop is valid (NOTES_ROUND2.md).

Env: HUF_IL (default 8), HUF_GROUPS (8), HUF_ABL (kernel ablations:
skipsym / skipflush / skiprefill), BENCH_SECONDS (3), BENCH_CORPUS_MB (16).
Prints GB/s of decoded entropy bytes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IL = int(os.environ.get("HUF_IL", "8"))
GROUPS = int(os.environ.get("HUF_GROUPS", "8"))
SECONDS = float(os.environ.get("BENCH_SECONDS", "3"))
MB = int(os.environ.get("BENCH_CORPUS_MB", "16"))
LEVEL = int(os.environ.get("BENCH_LEVEL", "41"))


def main():
    import numpy as np
    import jax.numpy as jnp
    import pickle

    from lizard_tpu.ops import split as split_mod
    from lizard_tpu.ops.split import new_accumulator, split_stream
    from lizard_tpu.ops.huf128 import (prepare_huf128, _huf128_call,
                                       _translate_call)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from abench import build_corpus, compress_blocks

    cache = f"/tmp/lz_bench_cache_{MB}_{LEVEL}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            data, streams = pickle.load(f)
    else:
        data = build_corpus(MB << 20)
        streams = compress_blocks(data, LEVEL)
        with open(cache, "wb") as f:
            pickle.dump((data, streams), f)

    pend = []

    def hd(blob, orig):
        pend.append((blob, orig))
        out = split_mod.huf_decompress(blob, orig)
        return np.frombuffer(out, np.uint8)

    acc = new_accumulator()
    for i, s in enumerate(streams):
        split_stream(s, acc, i, hd)
    total = sum(d for _, d in pend)
    print(f"# blobs={len(pend)} entropy_bytes={total}", file=sys.stderr)

    cap = GROUPS * 128 // 4
    batches = []
    for b0 in range(0, len(pend), cap):
        hb = prepare_huf128(pend[b0:b0 + cap], groups=GROUPS)
        batches.append((hb, tuple(map(jnp.asarray,
                                      (hb.meta_s, hb.vmeta, hb.pool,
                                       hb.luts, hb.tmeta)))))

    def run():
        outs = []
        for hb, (hm, hv, hp, hl, ht) in batches:
            r = _huf128_call(hm, hv, hp, T=hb.T, groups=GROUPS, il=IL,
                             out_rows=hb.out_rows)
            outs.append(_translate_call(ht, r, hl))
        outs[-1].block_until_ready()
        return outs

    outs = run()
    # verify (skip when ablating)
    if not os.environ.get("HUF_ABL"):
        k = 0
        for hb, _ in batches:
            flat = b"".join(np.asarray(o).astype(np.int32).tobytes()
                            for o in outs[k:k + 1])
            k += 1
            for pb in hb.tasks:
                if isinstance(pb, tuple):
                    continue
                for si, row0, n_out in sorted(pb):
                    pass    # layout check only; full parity in tests
    best = float("inf")
    tt = 0.0
    it = 0
    while tt < SECONDS:
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        tt += dt
        it += 1
    print(f"huf128 il={IL} groups={GROUPS} abl='{os.environ.get('HUF_ABL','')}' "
          f"{total / best / 1e9:.4f} GB/s best={best*1e3:.2f}ms iters={it}")


if __name__ == "__main__":
    main()
