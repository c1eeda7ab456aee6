"""Streaming (multi-call) compression/decompression APIs, the equivalents of
Lizard_createStream/Lizard_compress_continue/Lizard_saveDict and
Lizard_setStreamDecode/Lizard_decompress_safe_continue
(lib/lizard_compress.h:150-198, lib/lizard_decompress.h:95-145).

The compressor supports contiguous continuation (each call's input appended
to one logical buffer — the common double-buffer/file-streaming pattern);
the window spans calls up to the level's windowLog, exactly like the
reference's linked blocks. Non-contiguous extDict continuation is not yet
implemented (the frame layer never needs it with stableSrc inputs).
"""

from lizard_tpu.format.constants import LIZARD_DICT_SIZE
from lizard_tpu.format.levels import LEVELS, validate_level
from lizard_tpu.ref.block_decode import decompress as block_decompress
from lizard_tpu.ref.block_encode import Ctx, Tables, compress_range


class CompressStream:
    """Lizard_createStream + Lizard_compress_continue equivalent."""

    def __init__(self, level: int = 17):
        self.level = validate_level(level)
        self.params = LEVELS[self.level]
        self.ctx = Ctx(self.level, self.params)
        self.tables = Tables(self.params)
        self.buf = bytearray()

    def compress_continue(self, chunk: bytes) -> bytes:
        """Compress `chunk` with the window covering all previous chunks
        (bounded by windowLog). Returns one compressed stream."""
        start = len(self.buf)
        self.buf += chunk
        out = compress_range(self.ctx, self.tables, self.buf, start,
                             len(self.buf))
        # bound host memory like Lizard_saveDict: only the window matters
        if len(self.buf) > 2 * LIZARD_DICT_SIZE:
            # window indices are absolute; a rebase pass would be needed to
            # trim. Kept simple: trim is a planned optimization.
            pass
        return out

    def save_dict(self, max_size: int = LIZARD_DICT_SIZE) -> bytes:
        """Returns the current window tail (what Lizard_saveDict preserves)."""
        return bytes(self.buf[-max_size:])


class DecompressStream:
    """Lizard_setStreamDecode + Lizard_decompress_safe_continue equivalent:
    decodes a sequence of compressed streams whose windows chain."""

    def __init__(self, dict_data: bytes = b""):
        self.out = bytearray(dict_data)
        self.prefix = len(dict_data)

    def decompress_continue(self, src: bytes, max_out: int) -> bytes:
        before = len(self.out)
        block_decompress(src, max_out=max_out, out=self.out, window_base=0)
        return bytes(self.out[before:])


def decompress_partial(src: bytes, target: int, max_out: int) -> bytes:
    """Lizard_decompress_safe_partial: decode at least `target` bytes (may
    return up to a sequence boundary past it), never more than max_out."""
    out = block_decompress(src, max_out=max_out)
    return out[:max(target, 0)] if len(out) >= target else out


def decompress_using_dict(src: bytes, max_out: int, dict_data: bytes) -> bytes:
    """Lizard_decompress_safe_usingDict (prefix-mode)."""
    buf = bytearray(dict_data)
    prefix = len(buf)
    block_decompress(src, max_out=max_out, out=buf, window_base=0)
    return bytes(buf[prefix:])
