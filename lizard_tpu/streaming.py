"""Streaming (multi-call) compression/decompression APIs, the equivalents of
Lizard_createStream/Lizard_compress_continue/Lizard_saveDict/
Lizard_setExternalDict and Lizard_setStreamDecode/
Lizard_decompress_safe_continue/_usingDict/_partial
(lib/lizard_compress.h:150-198, lib/lizard_compress.c:440-580,
lib/lizard_decompress.h:95-145, lib/lizard_decompress.c:278-371).

Design notes (vs the reference's pointer mechanics):

- The reference distinguishes contiguous continuation, extDict (the
  previous window living in a different buffer), and saveDict (memmove the
  window tail in front of the state buffer + index rebase). In this
  re-design all three collapse into ONE invariant: the stream keeps a
  single logical window buffer = [retained dict tail | new data], trimmed
  and REBASED whenever it exceeds twice the window size. A rebase
  subtracts the trimmed byte count from every match-finder table entry
  (hash/chain positions are absolute, offset by DICT=16 MB, exactly like
  the reference's base-pointer scheme); entries that fall below the base
  become < DICT and every parser already rejects those via low_limit.
  Bounded memory for unbounded streams falls out (<= 2 windows + chunk).

- The decoder side mirrors Lizard_decompress_safe_continue's three modes
  with one mechanism: `history` holds the retained window (prefix mode
  keeps it contiguous; ring-buffer/extDict callers get the same semantics
  because matches only ever address the last windowLog bytes). Ring-buffer
  rules (lib/lizard_decompress.h:118-134): a ring >= windowSize+maxBlock
  or an exactly-windowSize ring both work -- `max_history` bounds memory.

- decompress_partial early-exits inside the token loop via the oracle's
  stop_at (ref/block_decode.py), not by decoding everything and slicing.
"""

from lizard_tpu.format.constants import LIZARD_DICT_SIZE
from lizard_tpu.format.levels import LEVELS, validate_level
from lizard_tpu.ref.block_decode import decompress as block_decompress
from lizard_tpu.ref.block_encode import DICT, Ctx, Tables, compress_range


class CompressStream:
    """Lizard_createStream + Lizard_compress_continue equivalent with
    bounded memory (Lizard_saveDict's actual job)."""

    def __init__(self, level: int = 17, dict_data: bytes = b""):
        self.level = validate_level(level)
        self.params = LEVELS[self.level]
        self.ctx = Ctx(self.level, self.params)
        self.tables = Tables(self.params)
        window = min(1 << self.params.window_log, LIZARD_DICT_SIZE)
        self.window = window
        self.buf = bytearray(dict_data[-window:])
        self._warm_tables()

    # -- internals ---------------------------------------------------------

    def _warm_tables(self):
        """Make a pre-loaded dictionary visible to the match finders
        (Lizard_loadDict, lizard_compress.c:393-414). Chain-family parsers
        self-insert history from next_to_update (= position 0) on the first
        compress call; the hash-probing fast parsers never revisit old
        positions, so their heads are inserted here."""
        from lizard_tpu.format.levels import Parser
        if self.params.parser not in (Parser.FAST, Parser.FAST_SMALL):
            return
        from lizard_tpu.ref.block_encode import _read64, hash5
        htab = self.tables.hash
        hlog = self.params.hash_log
        for i in range(max(len(self.buf) - 8, 0)):
            htab[hash5(_read64(self.buf, i), hlog)] = i + DICT

    def _rebase(self, delta: int) -> None:
        """Drop `delta` leading bytes of the logical buffer and shift every
        table index down (Lizard_saveDict memmove + rebase,
        lizard_compress.c:550-580; also the 2 GB wrap rebase at :440-470)."""
        if delta <= 0:
            return
        del self.buf[:delta]
        t = self.tables
        t.hash = [max(i - delta, 0) for i in t.hash]
        if t.hash3 is not None:
            t.hash3 = [max(i - delta, 0) for i in t.hash3]
        if t.chain is not None:
            t.chain = [max(i - delta, 0) for i in t.chain]
        t.next_to_update = max(t.next_to_update - delta, DICT)

    # -- API ---------------------------------------------------------------

    def compress_continue(self, chunk: bytes) -> bytes:
        """Compress `chunk` with the window covering all previous chunks
        (bounded by windowLog). Returns one compressed stream."""
        start = len(self.buf)
        self.buf += chunk
        out = compress_range(self.ctx, self.tables, self.buf, start,
                             len(self.buf))
        if len(self.buf) > 2 * self.window:
            self._rebase(len(self.buf) - self.window)
        return out

    def save_dict(self, max_size: int = LIZARD_DICT_SIZE) -> bytes:
        """Retain only the last min(max_size, window) bytes as dictionary
        and rebase the state onto them (Lizard_saveDict). Returns the
        retained bytes; subsequent compress_continue calls use them as the
        window."""
        keep = min(max_size, self.window, len(self.buf))
        self._rebase(len(self.buf) - keep)
        return bytes(self.buf)

    def set_external_dict(self, dict_data: bytes) -> None:
        """Lizard_setExternalDict: replace the window with an external
        buffer. Table history is discarded (entries point into the old
        window); the new dict becomes match-reachable immediately."""
        keep = dict_data[-self.window:]
        self.buf = bytearray(keep)
        t = self.tables
        t.hash = [0] * len(t.hash)
        if t.hash3 is not None:
            t.hash3 = [0] * len(t.hash3)
        if t.chain is not None:
            t.chain = [0] * len(t.chain)
        t.next_to_update = DICT
        self._warm_tables()


class DecompressStream:
    """Lizard_setStreamDecode + Lizard_decompress_safe_continue equivalent:
    decodes a sequence of compressed streams whose windows chain. Handles
    the prefix, external-dictionary and ring-buffer usage patterns with one
    bounded `history` buffer (see module docstring)."""

    def __init__(self, dict_data: bytes = b"",
                 max_history: int = LIZARD_DICT_SIZE):
        self.max_history = max_history
        self.history = bytearray(dict_data[-max_history:])

    def decompress_continue(self, src: bytes, max_out: int) -> bytes:
        before = len(self.history)
        block_decompress(src, max_out=max_out, out=self.history,
                         window_base=0)
        new = bytes(self.history[before:])
        if len(self.history) > self.max_history:
            del self.history[:len(self.history) - self.max_history]
        return new


def decompress_partial(src: bytes, target: int, max_out: int,
                       dict_data: bytes = b"") -> bytes:
    """Lizard_decompress_safe_partial: decode at least `target` bytes then
    STOP -- the token loop early-exits and the rest of the input is never
    parsed (lib/lizard_decompress_lz4.h:82,144). Returns exactly
    min(target, decoded) bytes, never more than max_out."""
    if target <= 0:
        return b""
    buf = bytearray(dict_data)
    prefix = len(buf)
    block_decompress(src, max_out=max_out, out=buf, window_base=0,
                     stop_at=min(target, max_out))
    got = bytes(buf[prefix:])
    return got[:target]


def decompress_using_dict(src: bytes, max_out: int, dict_data: bytes) -> bytes:
    """Lizard_decompress_safe_usingDict: one-shot decode with an external
    dictionary (covers the prefix and extDict modes,
    lizard_decompress.c:354-371)."""
    buf = bytearray(dict_data)
    prefix = len(buf)
    block_decompress(src, max_out=max_out, out=buf, window_base=0)
    return bytes(buf[prefix:])
