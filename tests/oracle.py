"""ctypes binding to the *reference* liblizard, used purely as a test oracle.

Build it with tools/build_reference.sh (artifacts are gitignored). Tests that
need the oracle should call `require_oracle()` and will be skipped when the
reference tree/toolchain is unavailable.
"""
import ctypes
import os
import subprocess

import pytest

_SO = os.path.join(os.path.dirname(__file__), "..", ".ref_build", "liblizard_ref.so")
_SO_O0 = os.path.join(os.path.dirname(__file__), "..", ".ref_build", "liblizard_ref_O0.so")
_lib = None
_lib_o0 = None


def _load():
    global _lib, _lib_o0
    if _lib is not None:
        return _lib
    so = os.path.abspath(_SO)
    if not os.path.exists(so):
        script = os.path.join(os.path.dirname(__file__), "..", "tools", "build_reference.sh")
        try:
            subprocess.run(["sh", script], check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        _lib_o0 = ctypes.CDLL(os.path.abspath(_SO_O0))
    except OSError:
        return None

    lib.Lizard_compress.restype = ctypes.c_int
    lib.Lizard_compress.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.Lizard_decompress_safe.restype = ctypes.c_int
    lib.Lizard_decompress_safe.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                           ctypes.c_int, ctypes.c_int]
    lib.Lizard_compressBound.restype = ctypes.c_int
    lib.Lizard_compressBound.argtypes = [ctypes.c_int]
    for l in (lib, _lib_o0):
        l.Lizard_sizeofState.restype = ctypes.c_int
        l.Lizard_sizeofState.argtypes = [ctypes.c_int]
        l.Lizard_compress_extState.restype = ctypes.c_int
        l.Lizard_compress_extState.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                               ctypes.c_char_p, ctypes.c_int,
                                               ctypes.c_int, ctypes.c_int]
    # xxhash (namespaced)
    lib.Lizard_XXH32.restype = ctypes.c_uint32
    lib.Lizard_XXH32.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint32]
    lib.Lizard_XXH64.restype = ctypes.c_uint64
    lib.Lizard_XXH64.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint64]
    # frame API
    lib.LizardF_compressFrameBound.restype = ctypes.c_size_t
    lib.LizardF_compressFrameBound.argtypes = [ctypes.c_size_t, ctypes.c_void_p]
    lib.LizardF_compressFrame.restype = ctypes.c_size_t
    lib.LizardF_isError.restype = ctypes.c_uint
    lib.LizardF_isError.argtypes = [ctypes.c_size_t]
    _lib = lib
    return lib


def require_oracle():
    lib = _load()
    if lib is None:
        pytest.skip("reference liblizard oracle unavailable")
    return Oracle(lib)


class _FramePrefs(ctypes.Structure):
    # LizardF_preferences_t (lib/lizard_frame.h:111-125)
    _fields_ = [
        ("blockSizeID", ctypes.c_uint),
        ("blockMode", ctypes.c_uint),
        ("contentChecksumFlag", ctypes.c_uint),
        ("frameType", ctypes.c_uint),
        ("contentSize", ctypes.c_ulonglong),
        ("reserved", ctypes.c_uint * 2),
        ("compressionLevel", ctypes.c_int),
        ("autoFlush", ctypes.c_uint),
        ("reserved1", ctypes.c_uint * 3),
    ]


class Oracle:
    def __init__(self, lib):
        self.lib = lib

    def compress(self, data: bytes, level: int) -> bytes:
        """Deterministic reference compression: extState with a freshly
        ZEROED state (the library leaves hash/chain tables uninitialized, so
        plain Lizard_compress output depends on heap history)."""
        bound = self.lib.Lizard_compressBound(len(data))
        dst = ctypes.create_string_buffer(bound)
        # the -O0 build is the UB-free parity target (see build_reference.sh)
        lib = _lib_o0 if _lib_o0 is not None else self.lib
        state_size = lib.Lizard_sizeofState(level)
        state = ctypes.create_string_buffer(state_size)  # zero-initialized
        n = lib.Lizard_compress_extState(state, data, dst, len(data), bound, level)
        assert n > 0, f"reference compress failed (level {level}, {len(data)}B)"
        return dst.raw[:n]

    def decompress(self, data: bytes, out_size: int) -> bytes:
        dst = ctypes.create_string_buffer(max(out_size, 1))
        n = self.lib.Lizard_decompress_safe(data, dst, len(data), out_size)
        assert n >= 0, f"reference decompress failed: {n}"
        return dst.raw[:n]

    def try_decompress(self, data: bytes, out_size: int) -> int:
        dst = ctypes.create_string_buffer(max(out_size, 1))
        return self.lib.Lizard_decompress_safe(data, dst, len(data), out_size)

    def xxh32(self, data: bytes, seed: int = 0) -> int:
        return self.lib.Lizard_XXH32(data, len(data), seed)

    def xxh64(self, data: bytes, seed: int = 0) -> int:
        return self.lib.Lizard_XXH64(data, len(data), seed)

    def compress_frame(self, data: bytes, level: int, block_size_id: int = 0,
                       block_linked: bool = False, checksum: bool = True) -> bytes:
        prefs = _FramePrefs()
        prefs.blockSizeID = block_size_id
        prefs.blockMode = 0 if block_linked else 1  # lizard_frame.h:85-86
        prefs.contentChecksumFlag = 1 if checksum else 0
        prefs.compressionLevel = level
        bound = self.lib.LizardF_compressFrameBound(len(data), ctypes.byref(prefs))
        dst = ctypes.create_string_buffer(bound)
        n = self.lib.LizardF_compressFrame(dst, bound, data, len(data), ctypes.byref(prefs))
        assert not self.lib.LizardF_isError(n)
        return dst.raw[:n]
