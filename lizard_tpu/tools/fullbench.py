"""Per-function micro-benchmarks, the equivalent of tests/fullbench.c:
times each public codec function individually (doubling as an API-coverage
smoke test). `python -m lizard_tpu.tools.fullbench [-i iters] [file]`."""

import sys
import time


def _time(fn, iters):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    iters = 3
    path = None
    i = 0
    while i < len(argv):
        if argv[i] == "-i":
            iters = int(argv[i + 1]); i += 2
        elif argv[i].startswith("-i"):
            iters = int(argv[i][2:]); i += 1
        else:
            path = argv[i]; i += 1

    from lizard_tpu import runtime
    from lizard_tpu.frame import compress_frame, decompress_frame
    from lizard_tpu.ref.block_decode import decompress as py_decompress
    from lizard_tpu.ref.block_encode import compress
    from lizard_tpu.ref.huf import huf_decompress
    from lizard_tpu.ref.huf_encode import huf_compress
    from lizard_tpu.utils.datagen import gen
    from lizard_tpu.utils.xxh import xxh32, xxh64

    data = open(path, "rb").read() if path else gen(256 * 1024, 0)
    n = len(data)

    rows = []

    def bench(name, fn, size=n):
        dt = _time(fn, iters)
        rows.append((name, size / dt / 1e6))

    comp10 = compress(data, 10)
    comp31 = compress(data, 31)
    bench("Lizard_compress -10 (oracle)", lambda: compress(data, 10))
    bench("Lizard_compress -21 (oracle)", lambda: compress(data, 21))
    bench("Lizard_decompress -10 (oracle)", lambda: py_decompress(comp10, n))
    if runtime.available():
        bench("Lizard_decompress -10 (native)", lambda: runtime.decompress(comp10, n))
        bench("Lizard_decompress -31 (native)", lambda: runtime.decompress(comp31, n))
    frame = compress_frame(data, 11)
    bench("LizardF_compressFrame -11", lambda: compress_frame(data, 11))
    bench("LizardF_decompress", lambda: decompress_frame(frame))
    bench("XXH32", lambda: xxh32(data))
    bench("XXH64", lambda: xxh64(data))
    if runtime.available():
        bench("XXH32 (native)", lambda: runtime.xxh32(data))
    bench("Lizard_compress -11 (native C++)",
          lambda: runtime.compress(data, 11)) if runtime.available() else None
    import jax
    if jax.default_backend() == "tpu":
        # lane-parallel TPU decode: 128KB independent blocks, device pipeline
        from lizard_tpu.ops.lane_decode import decompress_lanes
        chunks = [data[i:i + 131072] for i in range(0, n, 131072)]
        streams10 = [compress(c, 10) for c in chunks]
        decompress_lanes(streams10)  # compile
        bench("Lizard_decompress -10 (TPU lanes)",
              lambda: decompress_lanes(streams10))
        # fused entropy path (huf128 -> compact -> lanes, ops/fuse.py)
        from lizard_tpu.ops.fuse import decompress_lanes_fused
        streams41 = [compress(c, 41) for c in chunks]
        decompress_lanes_fused(streams41)  # compile
        bench("Lizard_decompress -41 (TPU fused)",
              lambda: decompress_lanes_fused(streams41))
        # lane encoder (p1 + pass A on device, emission on host)
        from lizard_tpu.ops.enc_lanes import encode_blocks_lanes
        encode_blocks_lanes(chunks[:8], level=11)  # compile
        bench("Lizard_compress -11 (TPU lanes)",
              lambda: encode_blocks_lanes(chunks[:8], level=11),
              sum(len(c) for c in chunks[:8]))
    hc = huf_compress(data[:128 * 1024])
    if hc:
        bench("HUF_compress", lambda: huf_compress(data[:128 * 1024]),
              min(n, 128 * 1024))
        bench("HUF_decompress", lambda: huf_decompress(hc, min(n, 128 * 1024)),
              min(n, 128 * 1024))

    width = max(len(r[0]) for r in rows)
    for name, mbps in rows:
        print(f"{name:<{width}}  {mbps:10.2f} MB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
