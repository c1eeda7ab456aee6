"""`lizard`-compatible command line interface (programs/lizardcli.c:239-581).

Supported surface:
  lizard [arg] [input] [output]
  -z / -d / -t        force compress / decompress / test
  -1 .. -9, -10..-49  compression level (digits aggregate like the reference)
  -f                  overwrite output
  -c                  write to stdout
  -k                  keep source (default; present for compatibility)
  -B1..-B7            frame block size id
  -BD                 linked blocks
  --no-frame-crc      disable content checksum
  --content-size      store uncompressed size in frame header
  -m                  multiple input files
  -v / -q             verbosity up / down
  -b# [-e#] [-i#]     in-memory benchmark of level(s) on the input files
  argv0 `lizardcat` => decompress to stdout; `unlizard` => decompress

Decompress auto-detects legacy pass-through and skippable frames; `.liz` is
the default suffix.
"""

import os
import sys
import time

from lizard_tpu.format.constants import LIZARD_DEFAULT_CLEVEL
from lizard_tpu.frame import FrameDecoder, compress_frame
from lizard_tpu.utils.xxh import xxh64

LIZARD_EXTENSION = ".liz"


class Options:
    def __init__(self):
        self.mode = "auto"          # auto | compress | decompress | test | bench
        self.level = 1
        self.block_size_id = 4      # CLI default -B4 (lizardcli.c:62)
        self.block_linked = False
        self.frame_crc = True
        self.content_size = False
        self.overwrite = False
        self.stdout = False
        self.multiple = False
        self.verbosity = 2
        self.bench_level_end = 0
        self.bench_iters = 3
        self.inputs = []
        self.output = None
        self.backend = os.environ.get("LIZARD_TPU_BACKEND", "ref")


def _log(opts, lvl, msg):
    if opts.verbosity >= lvl:
        print(msg, file=sys.stderr)


def parse_args(argv, prog="lizard"):
    opts = Options()
    if prog.endswith("lizardcat"):
        opts.mode = "decompress"
        opts.stdout = True
        opts.verbosity = 1
    elif prog.endswith("unlizard"):
        opts.mode = "decompress"

    i = 0
    while i < len(argv):
        arg = argv[i]
        if arg == "--no-frame-crc":
            opts.frame_crc = False
        elif arg == "--content-size":
            opts.content_size = True
        elif arg == "--help" or arg == "-h":
            print(__doc__)
            sys.exit(0)
        elif arg.startswith("-") and len(arg) > 1:
            j = 1
            while j < len(arg):
                c = arg[j]
                if c.isdigit():
                    # digits aggregate: -29 == level 29 (lizardcli.c:300)
                    lv = 0
                    while j < len(arg) and arg[j].isdigit():
                        lv = lv * 10 + int(arg[j])
                        j += 1
                    opts.level = lv
                    continue
                if c == "z":
                    opts.mode = "compress"
                elif c == "d":
                    opts.mode = "decompress"
                elif c == "t":
                    opts.mode = "test"
                elif c == "f":
                    opts.overwrite = True
                elif c == "c":
                    opts.stdout = True
                    opts.verbosity = 1
                elif c == "k":
                    pass
                elif c == "m":
                    opts.multiple = True
                elif c == "v":
                    opts.verbosity += 1
                elif c == "q":
                    opts.verbosity -= 1
                elif c == "B":
                    j += 1
                    while j < len(arg):
                        if arg[j] == "D":
                            opts.block_linked = True
                            j += 1
                        elif arg[j].isdigit():
                            opts.block_size_id = int(arg[j])
                            j += 1
                        else:
                            break
                    continue
                elif c == "b":
                    opts.mode = "bench"
                    j += 1
                    lv = 0
                    while j < len(arg) and arg[j].isdigit():
                        lv = lv * 10 + int(arg[j])
                        j += 1
                    if lv:
                        opts.level = lv
                    continue
                elif c == "e":
                    j += 1
                    lv = 0
                    while j < len(arg) and arg[j].isdigit():
                        lv = lv * 10 + int(arg[j])
                        j += 1
                    opts.bench_level_end = lv
                    continue
                elif c == "i":
                    j += 1
                    it = 0
                    while j < len(arg) and arg[j].isdigit():
                        it = it * 10 + int(arg[j])
                        j += 1
                    opts.bench_iters = max(it, 1)
                    continue
                else:
                    raise SystemExit(f"lizard: unknown option -{c}")
                j += 1
        else:
            opts.inputs.append(arg)
        i += 1

    if not opts.multiple and len(opts.inputs) > 1:
        opts.output = opts.inputs.pop()
    return opts


def _compress_backend(opts, data):
    level = (opts.level if opts.level >= 10 else 10 * opts.level
             if opts.level else LIZARD_DEFAULT_CLEVEL)
    if opts.backend == "native" and not opts.block_linked:
        from lizard_tpu.frame import compress_frame_fast
        return compress_frame_fast(
            data, level=level, block_size_id=opts.block_size_id,
            content_checksum=opts.frame_crc, content_size=opts.content_size)
    return compress_frame(
        data, level=level,
        block_size_id=opts.block_size_id,
        block_linked=opts.block_linked,
        content_checksum=opts.frame_crc,
        content_size=opts.content_size)


def _decompress_backend(opts, data):
    if opts.backend == "native":
        from lizard_tpu import runtime
        if runtime.available():
            try:
                from lizard_tpu.frame import decoded_size_bound
                return runtime.decompress_frame(
                    data, max_out=decoded_size_bound(data))
            except Exception:
                pass
    if opts.backend in ("lanes", "jax"):
        from lizard_tpu.api import decompress_frame
        try:
            return decompress_frame(data, backend="auto")
        except Exception:
            pass
    dec = FrameDecoder()
    out = dec.update(data)
    # Any unconsumed bytes — a mid-frame truncation OR a trailing fragment
    # shorter than a next-frame header — mean the file is not a clean
    # sequence of complete frames (lizardio.c:783-786 warns here; we error).
    if len(dec.buf) or (not dec.finished and data):
        raise ValueError("truncated frame: unfinished stream")
    return out


def _do_file_compress(opts, src_path):
    dst_path = opts.output or (src_path + LIZARD_EXTENSION)
    data = sys.stdin.buffer.read() if src_path == "-" else open(src_path, "rb").read()
    t0 = time.time()
    frame = _compress_backend(opts, data)
    dt = time.time() - t0
    if opts.stdout or dst_path == "-":
        sys.stdout.buffer.write(frame)
    else:
        if os.path.exists(dst_path) and not opts.overwrite:
            raise SystemExit(f"lizard: {dst_path} already exists; use -f")
        with open(dst_path, "wb") as f:
            f.write(frame)
        if src_path != "-":
            st = os.stat(src_path)
            os.utime(dst_path, (st.st_atime, st.st_mtime))
    ratio = 100.0 * len(frame) / len(data) if data else 0.0
    _log(opts, 2, f"Compressed {len(data)} bytes into {len(frame)} bytes "
                  f"==> {ratio:.2f}% ({dt:.2f}s)")


def _do_file_decompress(opts, src_path, test_only=False):
    if src_path == "-":
        data = sys.stdin.buffer.read()
        dst_path = opts.output or "-"
    else:
        data = open(src_path, "rb").read()
        if opts.output:
            dst_path = opts.output
        elif src_path.endswith(LIZARD_EXTENSION):
            dst_path = src_path[:-len(LIZARD_EXTENSION)]
        else:
            dst_path = src_path + ".out"
    # Magic dispatch (lizardio.c:743-788): unrecognized leading magic is
    # passed through unchanged when -f and not test mode, else rejected.
    from lizard_tpu.frame import LIZARDF_MAGIC, LIZARDF_MAGIC_SKIPPABLE_START
    magic = int.from_bytes(data[0:4], "little") if len(data) >= 4 else -1
    if data and magic != LIZARDF_MAGIC and \
            (magic & 0xFFFFFFF0) != LIZARDF_MAGIC_SKIPPABLE_START:
        if test_only or not opts.overwrite:
            raise SystemExit(
                f"lizard: {src_path}: unrecognized header, file cannot be "
                f"decoded (use -df to pass through unknown formats)")
        _log(opts, 3, f"{src_path}: unknown format, passing through")
        out = data
    else:
        out = _decompress_backend(opts, data)
    if test_only:
        _log(opts, 2, f"{src_path}: decoded {len(out)} bytes")
        return
    if opts.stdout or dst_path == "-":
        sys.stdout.buffer.write(out)
    else:
        if os.path.exists(dst_path) and not opts.overwrite:
            raise SystemExit(f"lizard: {dst_path} already exists; use -f")
        with open(dst_path, "wb") as f:
            f.write(out)
    _log(opts, 2, f"Decompressed {len(out)} bytes from {src_path}")


def _do_bench(opts):
    """In-memory benchmark, programs/bench.c protocol (fastest of N,
    xxh64-verified round-trip)."""
    from lizard_tpu.api import compress as block_compress
    from lizard_tpu.ref.block_decode import decompress as block_decompress
    from lizard_tpu.utils.datagen import gen

    datas = ([open(p, "rb").read() for p in opts.inputs]
             if opts.inputs else [gen(1 << 20, seed=0)])
    lv_end = max(opts.bench_level_end, opts.level)
    for level in range(opts.level, lv_end + 1):
        for data in datas:
            csize, cbest, dbest = None, float("inf"), float("inf")
            for _ in range(opts.bench_iters):
                t0 = time.perf_counter()
                comp = block_compress(data, level)
                cbest = min(cbest, time.perf_counter() - t0)
                t0 = time.perf_counter()
                out = block_decompress(comp, max_out=len(data))
                dbest = min(dbest, time.perf_counter() - t0)
                csize = len(comp)
                assert xxh64(out) == xxh64(data), "round-trip mismatch!"
            print(f"-{level:2d} {len(data):>10} -> {csize:>10} "
                  f"({100.0*csize/max(len(data),1):6.2f}%) "
                  f"{len(data)/cbest/1e6:8.1f} MB/s {len(data)/dbest/1e6:8.1f} MB/s")


def main(argv=None, prog=None):
    argv = sys.argv[1:] if argv is None else argv
    prog = prog or os.path.basename(sys.argv[0] if sys.argv else "lizard")
    opts = parse_args(argv, prog)

    if opts.mode == "bench":
        _do_bench(opts)
        return 0

    inputs = opts.inputs or ["-"]
    for src in inputs:
        if opts.mode == "compress":
            _do_file_compress(opts, src)
        elif opts.mode == "decompress":
            _do_file_decompress(opts, src)
        elif opts.mode == "test":
            _do_file_decompress(opts, src, test_only=True)
        else:  # auto: decompress if .liz else compress
            if src.endswith(LIZARD_EXTENSION):
                _do_file_decompress(opts, src)
            else:
                _do_file_compress(opts, src)
    return 0


if __name__ == "__main__":
    sys.exit(main())
