#!/usr/bin/env python
"""Micro-bench of the lane-packed Huff0 decode kernel (ops/huf128.py).

Builds one batch of Huff0 blobs (the flags+literals streams the Huffman
levels produce), then times the kernel under the ONE-SHOT protocol: the
axon runtime serves REPEAT executions of this executable from a cache
(~0.1 ms, stale buffers, even with perturbed inputs -- NOTES_ROUND4.md),
so each timed sample AOT-compiles a distinct executable and times exactly
its first execution, RTT-subtracted.

Env: HUF_IL (default 8), HUF_GROUPS (8), BENCH_SECONDS (3),
BENCH_CORPUS_MB (16). Prints GB/s of decoded entropy bytes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IL = os.environ.get("HUF_IL")
GROUPS = os.environ.get("HUF_GROUPS")
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

    # The axon runtime serves REPEAT executions of an executable from a
    # cache (observed: first call real, later calls ~0.1 ms even with
    # perturbed inputs). The only honest protocol here: AOT-compile each
    # variant, then time exactly the FIRST execution. K disjoint subsets
    # give K independent samples; report the median sample.
    from lizard_tpu.ops.huf128 import pick_groups
    pend.sort(key=lambda t: -t[1])
    K = 3
    subsets = [pend[k::K] for k in range(K)]
    samples = []
    for sub in subsets:
        g = int(GROUPS) if GROUPS else pick_groups(4 * len(sub))
        hb = prepare_huf128(sub, groups=g)
        il = int(IL) if IL else g
        hm, hv, hp, hl, ht = map(jnp.asarray, (hb.meta_s, hb.vmeta,
                                               hb.pool, hb.luts,
                                               hb.tmeta))
        c1 = _huf128_call.lower(hm, hv, hp, T=hb.T, groups=hb.groups,
                                il=il, out_rows=hb.out_rows).compile()
        c2 = _translate_call.lower(ht, jnp.zeros((hb.out_rows, 128),
                                                 jnp.int32), hl).compile()
        for a in (hm, hv, hp, hl, ht):   # pre-stage inputs in HBM
            a.block_until_ready()
        t0 = time.perf_counter()
        r = c1(hm, hv, hp)
        o = c2(ht, r, hl)
        o.block_until_ready()
        dt = time.perf_counter() - t0
        nbytes = sum(d for _, d in sub)
        samples.append((nbytes / dt / 1e9, dt * 1e3, len(sub)))
    samples.sort()
    med = samples[len(samples) // 2]
    print(f"huf128 il={IL} groups={GROUPS} abl='{os.environ.get('HUF_ABL','')}' "
          f"{med[0]:.4f} GB/s t={med[1]:.2f}ms subsets={K} "
          f"all={[round(s[0], 3) for s in samples]}")


if __name__ == "__main__":
    main()
