"""Native host runtime bindings (native/lizard_runtime.cpp).

Provides fast host-side decode and xxhash for IO paths (CLI, verification)
where the TPU round-trip is unnecessary. Falls back to the pure-Python
implementations when the shared library isn't built; build with
tools/build_native.sh.
"""

import ctypes
import os
import subprocess

_SO = os.environ.get(
    "LIZARD_TPU_NATIVE_LIB",
    os.path.join(os.path.dirname(__file__), "..", "native", "build",
                 "liblizard_tpu_runtime.so"))
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = os.path.abspath(_SO)
    if not os.path.exists(so):
        script = os.path.join(os.path.dirname(__file__), "..", "tools",
                              "build_native.sh")
        try:
            subprocess.run(["sh", script], check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.ltpu_xxh32.restype = ctypes.c_uint32
    lib.ltpu_xxh32.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint32]
    lib.ltpu_xxh64.restype = ctypes.c_uint64
    lib.ltpu_xxh64.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint64]
    lib.ltpu_decompress.restype = ctypes.c_int64
    lib.ltpu_decompress.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                    ctypes.c_char_p, ctypes.c_size_t]
    lib.ltpu_frame_decompress.restype = ctypes.c_int64
    lib.ltpu_frame_decompress.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                          ctypes.c_char_p, ctypes.c_size_t]
    lib.ltpu_huf_decompress.restype = ctypes.c_int
    lib.ltpu_huf_decompress.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                        ctypes.c_char_p, ctypes.c_size_t]
    lib.ltpu_compress_lz4.restype = ctypes.c_int64
    lib.ltpu_compress_lz4.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                      ctypes.c_char_p, ctypes.c_size_t,
                                      ctypes.c_int, ctypes.c_int]
    lib.ltpu_compress.restype = ctypes.c_int64
    lib.ltpu_compress.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                  ctypes.c_char_p, ctypes.c_size_t,
                                  ctypes.c_int, ctypes.c_int]
    lib.ltpu_huf_compress.restype = ctypes.c_int64
    lib.ltpu_huf_compress.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                      ctypes.c_char_p, ctypes.c_size_t]
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.ltpu_emit_lz4.restype = ctypes.c_int64
    lib.ltpu_emit_lz4.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                  i64p, i64p, i64p, ctypes.c_int64,
                                  ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_int64]
    lib.ltpu_emit_liz.restype = ctypes.c_int64
    lib.ltpu_emit_liz.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                  i64p, i64p, i64p, ctypes.c_int64,
                                  ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_int64, ctypes.c_char_p, i64p]
    lib.ltpu_emit_liz_far.restype = ctypes.c_int64
    lib.ltpu_emit_liz_far.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, i64p, i64p, i64p, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64, i64p,
        ctypes.c_char_p, ctypes.c_int64, i64p,
        ctypes.c_char_p, i64p, ctypes.c_char_p, i64p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def xxh32(data: bytes, seed: int = 0) -> int:
    lib = _load()
    if lib is None:
        from lizard_tpu.utils.xxh import xxh32 as py
        return py(data, seed)
    return lib.ltpu_xxh32(data, len(data), seed)


def xxh64(data: bytes, seed: int = 0) -> int:
    lib = _load()
    if lib is None:
        from lizard_tpu.utils.xxh import xxh64 as py
        return py(data, seed)
    return lib.ltpu_xxh64(data, len(data), seed)


def decompress(src: bytes, max_out: int) -> bytes:
    """Block-stream decode (Lizard_decompress_safe equivalent)."""
    lib = _load()
    if lib is None:
        from lizard_tpu.ref.block_decode import decompress as py
        return py(src, max_out)
    dst = ctypes.create_string_buffer(max(max_out, 1))
    n = lib.ltpu_decompress(src, len(src), dst, max_out)
    if n < 0:
        raise ValueError(f"native decompress failed ({n})")
    return dst.raw[:n]


def decompress_frame(src: bytes, max_out: int) -> bytes:
    lib = _load()
    if lib is None:
        from lizard_tpu.frame import decompress_frames as py
        return py(src)
    dst = ctypes.create_string_buffer(max(max_out, 1))
    n = lib.ltpu_frame_decompress(src, len(src), dst, max_out)
    if n < 0:
        raise ValueError(f"native frame decompress failed ({n})")
    return dst.raw[:n]


def huf_decompress(src: bytes, dst_size: int) -> bytes:
    """Huff0 stream decode (native when available)."""
    lib = _load()
    if lib is None:
        from lizard_tpu.ref.huf import huf_decompress as py
        return py(src, dst_size)
    dst = ctypes.create_string_buffer(max(dst_size, 1))
    if lib.ltpu_huf_decompress(src, len(src), dst, dst_size) != 0:
        raise ValueError("native huf decode failed")
    return dst.raw[:dst_size]


def compress(data: bytes, level: int = 11, accel: int = 1,
             max_out: int | None = None) -> bytes:
    """Fast native block-stream compression, all levels 10..49: greedy
    match finder (fastLZ4 codewords for 10-19/30-39, LIZv1 with rep-offset
    for 20-29/40-49) with a native Huff0 entropy stage for levels >= 30
    (native/lizard_runtime.cpp). Output is a valid stream for the given
    level -- decodable by liblizard and every decoder here -- but NOT
    byte-identical to the reference encoder; use the `ref` backend for
    bit-exact parity."""
    if not 10 <= level <= 49:
        raise ValueError(f"invalid level {level}")
    lib = _load()
    if lib is None:
        from lizard_tpu.ref.block_encode import compress as py
        out = py(data, level)
        if max_out is not None and len(out) > max_out:
            raise ValueError("compressed size exceeds max_out")
        return out
    cap = (len(data) + len(data) // 2 + 4096 if max_out is None
           else max_out)
    dst = ctypes.create_string_buffer(max(cap, 1))
    r = lib.ltpu_compress(data, len(data), dst, cap, level, accel)
    if r == -1:
        raise ValueError("compressed size exceeds max_out")
    if r < 0:
        raise RuntimeError("native compression failed")
    return dst.raw[:r]


def huf_compress(data: bytes) -> bytes | None:
    """Native Huff0 compression (4-stream). None = not compressible
    (caller stores the stream raw), mirroring HUF_compress returning 0."""
    lib = _load()
    if lib is None:
        from lizard_tpu.ref.huf_encode import huf_compress as py
        return py(data)
    cap = len(data) + 1024
    dst = ctypes.create_string_buffer(cap)
    r = lib.ltpu_huf_compress(data, len(data), dst, cap)
    if r <= 0:
        return None
    return dst.raw[:r]


def emit_lz4(data: bytes, st, ml, off):
    """Native pass B (fastLZ4): token arrays -> (flags, lits) bytes,
    byte-identical to ops/enc_lanes.emit_tokens. None when the native
    runtime is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    import numpy as np
    st = np.ascontiguousarray(st, np.int64)
    ml = np.ascontiguousarray(ml, np.int64)
    off = np.ascontiguousarray(off, np.int64)
    nt = len(st)
    cap = len(data) + nt * 10 + 32
    flags = ctypes.create_string_buffer(max(nt, 1))
    lits = ctypes.create_string_buffer(cap)
    i64p = ctypes.POINTER(ctypes.c_int64)
    r = lib.ltpu_emit_lz4(data, len(data),
                          st.ctypes.data_as(i64p), ml.ctypes.data_as(i64p),
                          off.ctypes.data_as(i64p), nt, flags, lits, cap)
    if r < 0:
        raise RuntimeError("emit_lz4 overflow")
    return flags.raw[:nt], lits.raw[:r]


def emit_liz(data: bytes, st, ml, off):
    """Native pass B (LIZv1, offsets < 2^16): token arrays ->
    (flags, lits, off16) bytes, byte-identical to emit_tokens_liz."""
    lib = _load()
    if lib is None:
        return None
    import numpy as np
    st = np.ascontiguousarray(st, np.int64)
    ml = np.ascontiguousarray(ml, np.int64)
    off = np.ascontiguousarray(off, np.int64)
    nt = len(st)
    cap = len(data) + nt * 10 + 32
    flags = ctypes.create_string_buffer(max(nt, 1))
    lits = ctypes.create_string_buffer(cap)
    off16 = ctypes.create_string_buffer(max(nt * 2, 1))
    olen = ctypes.c_int64(0)
    i64p = ctypes.POINTER(ctypes.c_int64)
    r = lib.ltpu_emit_liz(data, len(data),
                          st.ctypes.data_as(i64p), ml.ctypes.data_as(i64p),
                          off.ctypes.data_as(i64p), nt, flags, lits, cap,
                          off16, ctypes.byref(olen))
    if r < 0:
        raise RuntimeError("emit_liz overflow")
    return flags.raw[:nt], lits.raw[:r], off16.raw[:olen.value]


def emit_liz_far(data: bytes, st, ml, off):
    """Native pass B (LIZv1, FULL codeword set incl. the off24 class for
    offsets >= 2^16): token arrays -> (flags, lits, off16, off24) bytes,
    byte-identical to _emit_tokens_liz_scalar. None when the native
    runtime is unavailable (caller falls back to the scalar emitter)."""
    lib = _load()
    if lib is None:
        return None
    import numpy as np
    st = np.ascontiguousarray(st, np.int64)
    ml = np.ascontiguousarray(ml, np.int64)
    off = np.ascontiguousarray(off, np.int64)
    nt = len(st)
    cap = len(data) + nt * 10 + 32
    fcap = 2 * nt + 8          # worst case: literal-carrier + long token
    flags = ctypes.create_string_buffer(max(fcap, 1))
    lits = ctypes.create_string_buffer(cap)
    off16 = ctypes.create_string_buffer(max(nt * 2, 1))
    off24 = ctypes.create_string_buffer(max(nt * 3, 1))
    nf = ctypes.c_int64(0)
    nl = ctypes.c_int64(0)
    n16 = ctypes.c_int64(0)
    n24 = ctypes.c_int64(0)
    i64p = ctypes.POINTER(ctypes.c_int64)
    r = lib.ltpu_emit_liz_far(
        data, len(data), st.ctypes.data_as(i64p), ml.ctypes.data_as(i64p),
        off.ctypes.data_as(i64p), nt,
        flags, fcap, ctypes.byref(nf), lits, cap, ctypes.byref(nl),
        off16, ctypes.byref(n16), off24, ctypes.byref(n24))
    if r < 0:
        raise RuntimeError("emit_liz_far overflow")
    return (flags.raw[:nf.value], lits.raw[:nl.value],
            off16.raw[:n16.value], off24.raw[:n24.value])
