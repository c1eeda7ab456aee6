"""Host-side stream splitting: compressed Lizard streams -> struct-of-arrays
block batch for the TPU decode kernels.

The block format (1 level byte + per-block 5 separated streams,
lib/lizard_decompress.c:115-264) is parsed on the host; stream payloads are
concatenated into flat arrays with per-block offsets. Huffman-coded streams
are entropy-decoded during the split (CPU for now; the table-decode kernel
moves on-device later).

Output layout (`BlockBatch`): everything the device kernels need, with no
Python objects inside the jitted path.
"""

from dataclasses import dataclass

import numpy as np

from lizard_tpu.format.constants import (
    FLAG_FLAGS,
    FLAG_LEN,
    FLAG_LITERALS,
    FLAG_OFFSET16,
    FLAG_OFFSET24,
    FLAG_UNCOMPRESSED,
    LIZARD_MAX_CLEVEL,
    LIZARD_MIN_CLEVEL,
)
from lizard_tpu.format.levels import LEVELS, Codewords
from lizard_tpu.ref.block_decode import CorruptError

try:  # native Huff0 is ~100x the pure-Python oracle
    from lizard_tpu import runtime as _rt
    if _rt.available():
        huf_decompress = _rt.huf_decompress
    else:
        from lizard_tpu.ref.huf import huf_decompress
except Exception:
    from lizard_tpu.ref.huf import huf_decompress


@dataclass
class BlockBatch:
    """A batch of inner blocks in SoA form. Blocks belonging to one
    compressed stream must stay in order: match windows span inner blocks."""
    codewords: Codewords
    n_blocks: int
    # flat payload arrays (uint8)
    flags: np.ndarray
    literals: np.ndarray
    off16: np.ndarray
    off24: np.ndarray
    # per-block [n_blocks] int32 offsets/lengths into the flat arrays
    flags_off: np.ndarray
    flags_len: np.ndarray
    lit_off: np.ndarray
    lit_len: np.ndarray
    off16_off: np.ndarray
    off16_len: np.ndarray
    off24_off: np.ndarray
    off24_len: np.ndarray
    # stream id per block (window/rep state never crosses stream boundaries
    # in *independent* mode; inner blocks of one stream share the window)
    stream_id: np.ndarray

    @property
    def max_tokens(self) -> int:
        return int(self.flags_len.max()) if self.n_blocks else 0


def _le24(b, i):
    return int(b[i]) | (int(b[i + 1]) << 8) | (int(b[i + 2]) << 16)


def _read_stream(src, ip, flag, hd=None):
    if not flag:
        if ip > len(src) - 3:
            raise CorruptError("stream header truncated")
        n = _le24(src, ip)
        start = ip + 3
        if start + n > len(src):
            raise CorruptError("stream truncated")
        return src[start:start + n], start + n
    if ip > len(src) - 6:
        raise CorruptError("huf stream header truncated")
    orig = _le24(src, ip)
    comp = _le24(src, ip + 3)
    if ip + 6 + comp > len(src):
        raise CorruptError("huf stream truncated")
    blob = bytes(src[ip + 6:ip + 6 + comp])
    if hd is not None:
        return hd(blob, orig), ip + 6 + comp
    data = huf_decompress(blob, orig)
    return np.frombuffer(data, dtype=np.uint8), ip + 6 + comp


def split_stream(src: bytes, batch: dict, stream_id: int,
                 hd=None) -> Codewords:
    """Split one compressed stream (level byte + inner blocks) into `batch`
    accumulator lists. Returns the codeword family. `hd(blob, orig)`, when
    given, handles Huffman-coded streams (deferred/TPU entropy decode)."""
    src = np.frombuffer(src, dtype=np.uint8)
    if len(src) < 1:
        raise CorruptError("empty stream")
    level = int(src[0])
    if level < LIZARD_MIN_CLEVEL or level > LIZARD_MAX_CLEVEL:
        raise CorruptError(f"bad level {level}")
    family = LEVELS[level].codewords

    ip = 1
    iend = len(src)
    while ip < iend:
        header = int(src[ip])
        ip += 1
        if header == FLAG_UNCOMPRESSED:
            n = _le24(src, ip)
            ip += 3
            if ip + n > iend:
                raise CorruptError("uncompressed block truncated")
            _append(batch, stream_id,
                    flags=np.zeros(0, np.uint8),
                    literals=src[ip:ip + n],
                    off16=np.zeros(0, np.uint8),
                    off24=np.zeros(0, np.uint8))
            ip += n
            continue
        if header & FLAG_LEN:
            raise CorruptError("FLAG_LEN set")
        lens, ip = _read_stream(src, ip, 0)
        o16, ip = _read_stream(src, ip, header & FLAG_OFFSET16, hd)
        o24, ip = _read_stream(src, ip, header & FLAG_OFFSET24, hd)
        flags, ip = _read_stream(src, ip, header & FLAG_FLAGS, hd)
        lits, ip = _read_stream(src, ip, header & FLAG_LITERALS, hd)
        _append(batch, stream_id, flags=flags, literals=lits, off16=o16, off24=o24)
    return family


def _append(batch, stream_id, **streams):
    for name, arr in streams.items():
        batch[name].append(arr)
    batch["stream_id"].append(stream_id)


def new_accumulator() -> dict:
    return {"flags": [], "literals": [], "off16": [], "off24": [], "stream_id": []}


def finalize(batch: dict, codewords: Codewords) -> BlockBatch:
    def cat(name):
        arrs = batch[name]
        flat = np.concatenate(arrs) if arrs else np.zeros(0, np.uint8)
        lens = np.array([len(a) for a in arrs], dtype=np.int32)
        offs = np.zeros(len(arrs), dtype=np.int32)
        if len(arrs):
            offs[1:] = np.cumsum(lens[:-1])
        return np.ascontiguousarray(flat), offs, lens

    flags, f_off, f_len = cat("flags")
    lits, l_off, l_len = cat("literals")
    o16, s_off, s_len = cat("off16")
    o24, b_off, b_len = cat("off24")
    return BlockBatch(
        codewords=codewords,
        n_blocks=len(batch["stream_id"]),
        flags=flags, literals=lits, off16=o16, off24=o24,
        flags_off=f_off, flags_len=f_len,
        lit_off=l_off, lit_len=l_len,
        off16_off=s_off, off16_len=s_len,
        off24_off=b_off, off24_len=b_len,
        stream_id=np.array(batch["stream_id"], dtype=np.int32),
    )


def split_streams(streams: list[bytes],
                  entropy: str = "host") -> BlockBatch:
    """Split multiple independent compressed streams into one batch.

    entropy="tpu" defers every Huffman-coded stream and decodes them all
    in batched lane-packed TPU kernel calls (ops/huf128.py) before
    finalize; "host" decodes inline with the native C++ Huff0."""
    acc = new_accumulator()
    family = None
    pend = []
    hd = None
    if entropy == "tpu":
        def hd(blob, orig):
            buf = np.zeros(orig, np.uint8)
            pend.append((blob, orig, buf))
            return buf
    for i, s in enumerate(streams):
        f = split_stream(s, acc, i, hd)
        if family is None:
            family = f
        elif family != f:
            raise CorruptError("mixed codeword families in one batch")
    if pend:
        decode_pending_tpu(pend)
    return finalize(acc, family or Codewords.LZ4)


def decode_pending_tpu(pend, groups=None, il=None):
    """Decode deferred huf blobs [(blob, orig, out_buf)] in <=4096-blob
    batches on the lane-packed TPU kernel; host fallback per batch on
    unsupported tables (tableLog > 11). Blobs are batched LARGEST-FIRST
    so batches are length-homogeneous: a kernel batch runs max(n_supers)
    supers for every stream, so mixing long literals blobs with short
    flags blobs leaves most cells idle most supers."""
    from lizard_tpu.ops.huf128 import huf_decompress_128
    # cell chains pack any number of streams per batch (episodes queue up
    # per cell); the cap only bounds one batch's pool/output memory
    cap = 4096
    pend = sorted(pend, key=lambda t: -t[1])
    for b0 in range(0, len(pend), cap):
        chunk = pend[b0:b0 + cap]
        try:
            outs = huf_decompress_128(
                [(blob, orig) for blob, orig, _ in chunk],
                groups=groups, il=il)
            for (_, orig, buf), out in zip(chunk, outs):
                buf[:] = np.frombuffer(out, np.uint8)
        except Exception:
            for blob, orig, buf in chunk:
                buf[:] = np.frombuffer(huf_decompress(blob, orig),
                                       np.uint8)
