"""Lizard frame format (doc/lizard_Frame_format.md; lib/lizard_frame.c).

Container: magic, descriptor (FLG/BD/contentSize/HC), LE32-size-prefixed
blocks (high bit = stored), endmark, optional xxh32 content checksum.

Encode replicates LizardF_compressFrame (lizard_frame.c:260-310):
- optimal blockSizeID shrink, autoFlush, forced independent blocks when the
  input fits one block
- per block: compressed with budget srcSize-1, else stored
  (LizardF_compressBlock, lizard_frame.c:456-469)
- the Lizard_stream_t (hash/chain tables) is reused across blocks without
  clearing, which is observable; replicated via a shared Tables

Decode is an incremental state machine accepting any input granularity
(FrameDecoder), mirroring LizardF_decompress (lizard_frame.c:963-1362).
"""

from lizard_tpu.format.constants import (
    LIZARD_DICT_SIZE,
    LIZARDF_BLOCK_SIZES,
    LIZARDF_BLOCKUNCOMPRESSED_FLAG,
    LIZARDF_MAGIC,
    LIZARDF_MAGIC_SKIPPABLE_START,
)
from lizard_tpu.format.levels import LEVELS, validate_level
from lizard_tpu.ref.block_decode import CorruptError, decompress as block_decompress
from lizard_tpu.ref.block_encode import Ctx, Tables, compress_range
from lizard_tpu.utils.xxh import XXH32
try:  # native xxh32 is ~100x the pure-python one (checksum of full frames)
    from lizard_tpu.runtime import xxh32
except Exception:
    from lizard_tpu.utils.xxh import xxh32


class FrameError(ValueError):
    pass


def _optimal_bsid(requested: int, src_size: int) -> int:
    """LizardF_optimalBSID (lizard_frame.c:203-218)."""
    proposed = 1
    while requested > proposed:
        if src_size <= LIZARDF_BLOCK_SIZES[proposed]:
            return proposed
        proposed += 1
    return requested


def compress_frame(data: bytes, level: int = 17, block_size_id: int = 0,
                   block_linked: bool = False, content_checksum: bool = True,
                   content_size: bool = False) -> bytes:
    """LizardF_compressFrame equivalent (lizard_frame.c:260-310)."""
    level = validate_level(level)
    if block_size_id == 0:
        block_size_id = 1  # LIZARDF_BLOCKSIZEID_DEFAULT (lizard_frame.c:120)
    block_size_id = _optimal_bsid(block_size_id, len(data))
    block_size = LIZARDF_BLOCK_SIZES[block_size_id]
    if len(data) <= block_size:
        block_linked = False  # lizard_frame.c:285-286

    out = bytearray()
    out += LIZARDF_MAGIC.to_bytes(4, "little")
    flg = (1 << 6) | ((0 if block_linked else 1) << 5) | (int(content_checksum) << 2) \
        | ((1 if content_size else 0) << 3)
    header = bytearray([flg, (block_size_id & 7) << 4])
    if content_size:
        header += len(data).to_bytes(8, "little")
    header.append((xxh32(bytes(header)) >> 8) & 0xFF)
    out += header

    params = LEVELS[level]
    tables = Tables(params)
    ctx = Ctx(level, params)

    pos = 0
    n = len(data)
    while pos < n or (n == 0 and pos == 0):
        part = min(block_size, n - pos)
        if n == 0:
            break
        if block_linked:
            comp = compress_range(ctx, tables, data, pos, pos + part)
        else:
            # extState per block: fresh ctx/window, tables NOT cleared
            ctx = Ctx(level, params)
            tables.next_to_update = 1 << 24  # Lizard_init resets it
            comp = compress_range(ctx, tables, data[pos:pos + part], 0, part)
        if len(comp) <= part - 1:
            out += len(comp).to_bytes(4, "little")
            out += comp
        else:
            out += (part | LIZARDF_BLOCKUNCOMPRESSED_FLAG).to_bytes(4, "little")
            out += data[pos:pos + part]
        pos += part

    out += (0).to_bytes(4, "little")  # endmark
    if content_checksum:
        out += xxh32(data).to_bytes(4, "little")
    return bytes(out)


class FrameInfo:
    def __init__(self):
        self.block_size_id = 0
        self.block_linked = False
        self.content_checksum = False
        self.content_size = None
        self.header_size = 0


def parse_frame_header(src: bytes) -> FrameInfo:
    """LizardF_decodeHeader (lizard_frame.c:756-857)."""
    if len(src) < 7:
        raise FrameError("frame header truncated")
    magic = int.from_bytes(src[0:4], "little")
    if magic != LIZARDF_MAGIC:
        raise FrameError(f"bad magic {magic:#x}")
    flg = src[4]
    bd = src[5]
    if (flg >> 6) & 3 != 1:
        raise FrameError("unsupported frame version")
    if flg & 0b11 or bd & 0b10001111:
        raise FrameError("reserved bits set")
    if (flg >> 4) & 1:
        raise FrameError("block checksum unsupported")  # as in the reference
    info = FrameInfo()
    info.block_linked = ((flg >> 5) & 1) == 0
    info.content_checksum = bool((flg >> 2) & 1)
    has_size = bool((flg >> 3) & 1)
    bsid = (bd >> 4) & 7
    if bsid not in LIZARDF_BLOCK_SIZES:
        raise FrameError("bad blockSizeID")
    info.block_size_id = bsid
    p = 6
    if has_size:
        if len(src) < 15:
            raise FrameError("frame header truncated")
        info.content_size = int.from_bytes(src[6:14], "little")
        p = 14
    hc = src[p]
    if (xxh32(src[4:p]) >> 8) & 0xFF != hc:
        raise FrameError("header checksum mismatch")
    info.header_size = p + 1
    return info


def decoded_size_bound(src: bytes) -> int:
    """Tight upper bound on the decoded size of a (possibly concatenated)
    frame stream, from headers alone — contentSize when stored, otherwise
    block-count x maxBlockSize (sizing analogue of lizardio.c:647-698).
    Raises FrameError on malformed input."""
    bound = 0
    p = 0
    n = len(src)
    while p < n:
        magic = int.from_bytes(src[p:p + 4], "little") if p + 4 <= n else -1
        if (magic & 0xFFFFFFF0) == LIZARDF_MAGIC_SKIPPABLE_START:
            if p + 8 > n:
                raise FrameError("skippable frame truncated")
            p += 8 + int.from_bytes(src[p + 4:p + 8], "little")
            continue
        info = parse_frame_header(src[p:])
        p += info.header_size
        max_block = LIZARDF_BLOCK_SIZES[info.block_size_id]
        frame_bound = 0
        while True:
            if p + 4 > n:
                raise FrameError("missing endmark")
            bsize = int.from_bytes(src[p:p + 4], "little")
            p += 4
            if bsize == 0:
                break
            stored = bool(bsize & LIZARDF_BLOCKUNCOMPRESSED_FLAG)
            bsize &= ~LIZARDF_BLOCKUNCOMPRESSED_FLAG
            frame_bound += bsize if stored else max_block
            p += bsize
        if p > n:
            raise FrameError("block truncated")
        if info.content_checksum:
            p += 4
        bound += (info.content_size if info.content_size is not None
                  else frame_bound)
    return bound


def decompress_frame(src: bytes, verify_checksum: bool = True) -> bytes:
    """Decode one frame; errors on trailing garbage unless it is another
    frame (use decompress_frames for concatenated/skippable streams)."""
    out, consumed = decompress_one_frame(src, verify_checksum)
    if consumed != len(src):
        raise FrameError("trailing data after frame")
    return out


def decompress_one_frame(src: bytes, verify_checksum: bool = True) -> tuple[bytes, int]:
    if len(src) >= 8:
        magic = int.from_bytes(src[0:4], "little")
        if (magic & 0xFFFFFFF0) == LIZARDF_MAGIC_SKIPPABLE_START:
            size = int.from_bytes(src[4:8], "little")
            if 8 + size > len(src):
                raise FrameError("skippable frame truncated")
            return b"", 8 + size
    info = parse_frame_header(src)
    p = info.header_size
    out = bytearray()
    while True:
        if p + 4 > len(src):
            raise FrameError("missing endmark")
        bsize = int.from_bytes(src[p:p + 4], "little")
        p += 4
        if bsize == 0:
            break
        stored = bool(bsize & LIZARDF_BLOCKUNCOMPRESSED_FLAG)
        bsize &= ~LIZARDF_BLOCKUNCOMPRESSED_FLAG
        if p + bsize > len(src):
            raise FrameError("block truncated")
        blob = src[p:p + bsize]
        p += bsize
        max_block = LIZARDF_BLOCK_SIZES[info.block_size_id]
        if stored:
            out += blob
        else:
            try:
                if info.block_linked:
                    block_decompress(blob, max_out=max_block, out=out, window_base=0)
                else:
                    prefix = len(out)
                    block_decompress(blob, max_out=max_block, out=out,
                                     window_base=prefix)
            except CorruptError as e:
                raise FrameError(f"block decode failed: {e}") from e
    if info.content_checksum:
        if p + 4 > len(src):
            raise FrameError("missing content checksum")
        stored_crc = int.from_bytes(src[p:p + 4], "little")
        p += 4
        if verify_checksum and xxh32(bytes(out)) != stored_crc:
            raise FrameError("content checksum mismatch")
    if info.content_size is not None and info.content_size != len(out):
        raise FrameError("content size mismatch")
    return bytes(out), p


def compress_frame_tpu(data: bytes, level: int = 11,
                       block_size_id: int = 0,
                       content_checksum: bool = True,
                       content_size: bool = False,
                       engine: str | None = None) -> bytes:
    """Frame compression with the TPU-native encoder: blockIndependent
    frame; every frame block's 128 KB chunks are batched through the
    device pipeline in one go. engine="lanes" (default) uses the Pallas
    lane pipeline (ops/enc_lanes.py: p1 match finder + pass-A parse on
    device, host emission); engine="xla" keeps the all-XLA reference
    pipeline (ops/encode_tpu.py, fastLZ4 levels only). The lanes
    engine covers all four level families (10-49)."""
    level = validate_level(level)
    if engine is None:
        # Pallas kernels need a real TPU; the all-XLA pipeline runs
        # anywhere (tests exercise it on the CPU backend) but only
        # serializes fastLZ4 — LIZv1 levels always take the lane path
        # (interpret mode on CPU)
        import jax
        engine = ("lanes" if jax.default_backend() != "cpu"
                  or level >= 20 else "xla")
    if engine == "lanes":
        from lizard_tpu.ops.enc_lanes import encode_streams_lanes
        encode_streams_tpu = encode_streams_lanes
    else:
        if level >= 20:
            raise ValueError("engine='xla' supports levels 10-19 only")
        from lizard_tpu.ops.encode_tpu import encode_streams_tpu
    if block_size_id == 0:
        block_size_id = 1
    block_size_id = _optimal_bsid(block_size_id, len(data))
    block_size = LIZARDF_BLOCK_SIZES[block_size_id]

    out = bytearray()
    out += LIZARDF_MAGIC.to_bytes(4, "little")
    flg = (1 << 6) | (1 << 5) | (int(content_checksum) << 2) \
        | ((1 if content_size else 0) << 3)
    header = bytearray([flg, (block_size_id & 7) << 4])
    if content_size:
        header += len(data).to_bytes(8, "little")
    out += header
    out.append((xxh32(bytes(header)) >> 8) & 0xFF)

    parts = [data[pos:pos + block_size]
             for pos in range(0, len(data), block_size)]
    comps = encode_streams_tpu(parts, level=level)
    for part, comp in zip(parts, comps):
        if len(comp) >= len(part):
            out += (len(part)
                    | LIZARDF_BLOCKUNCOMPRESSED_FLAG).to_bytes(4, "little")
            out += part
        else:
            out += len(comp).to_bytes(4, "little")
            out += comp
    out += (0).to_bytes(4, "little")
    if content_checksum:
        out += xxh32(data).to_bytes(4, "little")
    return bytes(out)


def compress_frame_fast(data: bytes, level: int = 11,
                        block_size_id: int = 0,
                        content_checksum: bool = True,
                        content_size: bool = False) -> bytes:
    """Fast frame compression: blockIndependent frame, each block compressed
    by the native C++ encoder (valid streams for any level 10..49 including
    the Huff0 stage at >= 30; not byte-identical to the reference; see
    lizard_tpu.runtime.compress). Falls back to the bit-exact python
    encoder when the native runtime is unavailable."""
    from lizard_tpu import runtime
    level = validate_level(level)
    if block_size_id == 0:
        block_size_id = 1
    block_size_id = _optimal_bsid(block_size_id, len(data))
    block_size = LIZARDF_BLOCK_SIZES[block_size_id]

    out = bytearray()
    out += LIZARDF_MAGIC.to_bytes(4, "little")
    flg = (1 << 6) | (1 << 5) | (int(content_checksum) << 2) \
        | ((1 if content_size else 0) << 3)
    header = bytearray([flg, (block_size_id & 7) << 4])
    if content_size:
        header += len(data).to_bytes(8, "little")
    out += header
    out.append((xxh32(bytes(header)) >> 8) & 0xFF)

    for pos in range(0, len(data), block_size):
        part = data[pos:pos + block_size]
        comp = runtime.compress(part, level)
        if len(comp) >= len(part):
            out += (len(part) | LIZARDF_BLOCKUNCOMPRESSED_FLAG).to_bytes(4, "little")
            out += part
        else:
            out += len(comp).to_bytes(4, "little")
            out += comp
    out += (0).to_bytes(4, "little")
    if content_checksum:
        out += xxh32(data).to_bytes(4, "little")
    return bytes(out)


class FrameEncoder:
    """Incremental frame compression: LizardF_compressBegin / Update /
    Flush / End (lizard_frame.c:501-629). Accepts arbitrary-granularity
    input; partial blocks buffer internally (the reference's tmpIn) until a
    full frame block accumulates or flush() forces one out. Linked mode
    keeps the LZ77 window chained across blocks in bounded memory (the
    dict-save machinery of lizard_tpu.streaming). Memory stays O(window +
    block), so files far larger than RAM stream through (the reference's
    6 GB huge-file test, tests/Makefile:229-232, relies on this).

    backend="native" routes blockIndependent blocks through the fast C++
    encoder; "ref" uses the bit-exact oracle. blockIndependent ref frames
    are byte-identical to one-shot compress_frame with the same prefs;
    linked frames are equivalent-but-not-identical once the window trims
    (the rebase drops far match candidates the contiguous one-shot path
    still sees)."""

    def __init__(self, level: int = 17, block_size_id: int = 0,
                 block_linked: bool = False, content_checksum: bool = True,
                 content_size: int | None = None, backend: str = "ref"):
        self.level = validate_level(level)
        self.params = LEVELS[self.level]
        if block_size_id == 0:
            block_size_id = 1  # LIZARDF_BLOCKSIZEID_DEFAULT
        self.block_size_id = block_size_id
        self.block_size = LIZARDF_BLOCK_SIZES[block_size_id]
        self.block_linked = block_linked
        self.content_checksum = content_checksum
        self.content_size = content_size
        self.backend = backend
        self.tmp = bytearray()      # partial-block buffer (tmpIn)
        self.total_in = 0
        self.xxh = XXH32(0) if content_checksum else None
        self._begun = False
        self._ended = False
        if block_linked:
            from lizard_tpu.streaming import CompressStream
            self._cs = CompressStream(self.level)
        else:
            self._tables = Tables(self.params)

    def begin(self) -> bytes:
        """Frame header bytes (LizardF_compressBegin)."""
        assert not self._begun
        self._begun = True
        out = bytearray()
        out += LIZARDF_MAGIC.to_bytes(4, "little")
        flg = (1 << 6) | ((0 if self.block_linked else 1) << 5) \
            | (int(self.content_checksum) << 2) \
            | ((1 if self.content_size is not None else 0) << 3)
        header = bytearray([flg, (self.block_size_id & 7) << 4])
        if self.content_size is not None:
            header += self.content_size.to_bytes(8, "little")
        header.append((xxh32(bytes(header)) >> 8) & 0xFF)
        out += header
        return bytes(out)

    def _emit_block(self, part: bytes) -> bytes:
        if self.block_linked:
            comp = self._cs.compress_continue(part)
        elif self.backend == "native":
            from lizard_tpu import runtime
            comp = runtime.compress(part, self.level)
        else:
            # extState per block: fresh ctx/window, tables NOT cleared
            ctx = Ctx(self.level, self.params)
            self._tables.next_to_update = 1 << 24  # Lizard_init
            comp = compress_range(ctx, self._tables, part, 0, len(part))
        out = bytearray()
        if len(comp) <= len(part) - 1:
            out += len(comp).to_bytes(4, "little")
            out += comp
        else:
            out += (len(part) | LIZARDF_BLOCKUNCOMPRESSED_FLAG).to_bytes(
                4, "little")
            out += part
        return bytes(out)

    def update(self, chunk: bytes) -> bytes:
        """Feed input; returns any compressed bytes produced
        (LizardF_compressUpdate: only whole blocks are emitted)."""
        if not self._begun or self._ended:
            raise FrameError("update outside begin/end")
        self.total_in += len(chunk)
        if self.xxh is not None:
            self.xxh.update(chunk)
        self.tmp += chunk
        out = bytearray()
        while len(self.tmp) >= self.block_size:
            part = bytes(self.tmp[:self.block_size])
            del self.tmp[:self.block_size]
            out += self._emit_block(part)
        return bytes(out)

    def flush(self) -> bytes:
        """Force the buffered partial block out (LizardF_flush)."""
        if not self.tmp:
            return b""
        part = bytes(self.tmp)
        self.tmp.clear()
        return self._emit_block(part)

    def end(self) -> bytes:
        """Flush + endmark + optional content checksum (LizardF_compressEnd).
        Raises FrameError if a declared content_size was not matched."""
        if self._ended:
            raise FrameError("end called twice")
        out = bytearray(self.flush())
        self._ended = True
        if (self.content_size is not None
                and self.total_in != self.content_size):
            raise FrameError(
                f"content size mismatch: declared {self.content_size}, "
                f"got {self.total_in}")
        out += (0).to_bytes(4, "little")
        if self.content_checksum:
            out += self.xxh.digest().to_bytes(4, "little")
        return bytes(out)


def decompress_frame_lanes(src: bytes, verify_checksum: bool = True,
                           interpret: bool = False, **lane_kw) -> bytes:
    """Decode one frame on the TPU lane-parallel kernel
    (lizard_tpu/ops/lane_decode.py). Every blockIndependent frame block is
    an independent chain, decoded 128-at-a-time.

    Eligible frames: blockIndependent, both codeword families at any block
    size (LIZv1 frame blocks > 128 KB decode as chained inner blocks; far
    matches are served from the kernel's HBM-staged far window). Raises
    FrameError for ineligible frames (callers fall back to the scalar/XLA
    paths)."""
    from lizard_tpu.format.levels import Codewords
    from lizard_tpu.ops.lane_decode import decompress_lanes

    info = parse_frame_header(src)
    if info.block_linked:
        raise FrameError("lane path requires blockIndependent frames")
    p = info.header_size
    entries = []   # ("stored", bytes) | ("stream", index)
    streams = []
    family = None
    while True:
        if p + 4 > len(src):
            raise FrameError("missing endmark")
        bsize = int.from_bytes(src[p:p + 4], "little")
        p += 4
        if bsize == 0:
            break
        stored = bool(bsize & LIZARDF_BLOCKUNCOMPRESSED_FLAG)
        bsize &= ~LIZARDF_BLOCKUNCOMPRESSED_FLAG
        if p + bsize > len(src):
            raise FrameError("block truncated")
        blob = src[p:p + bsize]
        p += bsize
        if stored:
            entries.append(("stored", blob))
            continue
        level = blob[0] if blob else 0
        fam = LEVELS[level].codewords if level in LEVELS else None
        if fam is None:
            raise FrameError("bad level byte")
        if family is None:
            family = fam
        elif family != fam:
            raise FrameError("mixed codeword families")
        entries.append(("stream", len(streams)))
        streams.append(blob)
    decoded = []
    if streams:
        use_fused = any(LEVELS[s[0]].codewords is not None and s[0] >= 30
                        for s in streams if s)
        if use_fused:
            # Huffman levels: the fused device pipeline (ops/fuse.py)
            # keeps decoded entropy bytes on device (it falls back to
            # the host-staged path itself when the batch is unfusable)
            from lizard_tpu.ops.fuse import decompress_lanes_fused
            decoded = decompress_lanes_fused(streams, interpret=interpret,
                                             **lane_kw)
        else:
            decoded = decompress_lanes(streams, interpret=interpret,
                                       **lane_kw)
    out = bytearray()
    for kind, v in entries:
        out += v if kind == "stored" else decoded[v]
    if info.content_checksum:
        if p + 4 > len(src):
            raise FrameError("missing content checksum")
        stored_crc = int.from_bytes(src[p:p + 4], "little")
        p += 4
        if verify_checksum and xxh32(bytes(out)) != stored_crc:
            raise FrameError("content checksum mismatch")
    if info.content_size is not None and info.content_size != len(out):
        raise FrameError("content size mismatch")
    if p != len(src):
        raise FrameError("trailing data after frame")
    return bytes(out)


def decompress_frames(src: bytes, verify_checksum: bool = True) -> bytes:
    """Decode a sequence of concatenated frames (incl. skippable)."""
    out = bytearray()
    p = 0
    while p < len(src):
        data, n = decompress_one_frame(src[p:], verify_checksum)
        out += data
        p += n
    return bytes(out)


class FrameDecoder:
    """Incremental frame decoder: accepts arbitrary-granularity input chunks
    and yields output as it becomes available, like LizardF_decompress's
    resumable dStage machine (lizard_frame.c:713-722,980-1319)."""

    def __init__(self, verify_checksum: bool = True):
        self.buf = bytearray()
        self.out = bytearray()
        self.emitted = 0          # index into self.out
        self.trimmed = 0          # bytes dropped from the front of self.out
        self.verify = verify_checksum
        self.state = "header"
        self.info = None
        self.xxh = XXH32(0)
        self.skip_left = 0
        self.finished = False
        self._frame_produced = 0

    def update(self, chunk: bytes) -> bytes:
        """Feed a chunk; returns newly decoded bytes. Memory stays bounded
        for arbitrarily long frames (lizardio.c:647-698's 64 KB loop relies
        on this): emitted output is dropped, keeping only the linked-mode
        window (<= LIZARD_DICT_SIZE) when one is needed."""
        self.buf += chunk
        progress = True
        while progress:
            progress = self._step()
        new = bytes(self.out[self.emitted:])
        self.emitted = len(self.out)
        self._trim()
        return new

    def _trim(self) -> None:
        logical_len = self.trimmed + len(self.out)
        if (self.info is not None and self.info.block_linked
                and not self.finished):
            keep_from = max(self._frame_out_start,
                            logical_len - LIZARD_DICT_SIZE)
        else:
            keep_from = logical_len
        cut = min(keep_from, self.trimmed + self.emitted)
        drop = cut - self.trimmed
        if drop > 0:
            del self.out[:drop]
            self.trimmed = cut
            self.emitted -= drop

    def _step(self) -> bool:
        buf = self.buf
        if self.state == "header":
            if len(buf) < 4:
                return False
            magic = int.from_bytes(buf[0:4], "little")
            if (magic & 0xFFFFFFF0) == LIZARDF_MAGIC_SKIPPABLE_START:
                if len(buf) < 8:
                    return False
                self.finished = False  # a new frame begins
                self.skip_left = int.from_bytes(buf[4:8], "little")
                del buf[:8]
                self.state = "skip"
                return True
            # need full descriptor; max 15 bytes
            if len(buf) < 7:
                return False
            has_size = bool((buf[4] >> 3) & 1)
            need = 15 if has_size else 7
            if len(buf) < need:
                return False
            self.info = parse_frame_header(bytes(buf[:need]))
            self.finished = False  # a new frame begins
            del buf[:self.info.header_size]
            self.xxh = XXH32(0)
            self._frame_out_start = self.trimmed + len(self.out)
            self._frame_produced = 0
            self.state = "blocksize"
            return True
        if self.state == "skip":
            n = min(self.skip_left, len(buf))
            del buf[:n]
            self.skip_left -= n
            if self.skip_left == 0:
                self.state = "header"
                self.finished = True
                return True
            return False
        if self.state == "blocksize":
            if len(buf) < 4:
                return False
            bsize = int.from_bytes(buf[0:4], "little")
            if bsize == 0:
                del buf[:4]
                self.state = "suffix" if self.info.content_checksum else "header"
                if self.state == "header":
                    self._check_content_size()
                    self.finished = True
                return True
            self._bsize = bsize & ~LIZARDF_BLOCKUNCOMPRESSED_FLAG
            self._stored = bool(bsize & LIZARDF_BLOCKUNCOMPRESSED_FLAG)
            del buf[:4]
            self.state = "block"
            return True
        if self.state == "block":
            if len(buf) < self._bsize:
                return False
            blob = bytes(buf[:self._bsize])
            del buf[:self._bsize]
            max_block = LIZARDF_BLOCK_SIZES[self.info.block_size_id]
            if self._stored:
                produced = blob
                self.out += blob
            else:
                prefix = len(self.out)
                base = (max(self._frame_out_start - self.trimmed, 0)
                        if self.info.block_linked else prefix)
                block_decompress(blob, max_out=max_block, out=self.out,
                                 window_base=base)
                produced = bytes(self.out[prefix:])
            self._frame_produced += len(produced)
            if self.info.content_checksum:
                self.xxh.update(produced)
            self.state = "blocksize"
            return True
        if self.state == "suffix":
            if len(buf) < 4:
                return False
            stored_crc = int.from_bytes(buf[0:4], "little")
            del buf[:4]
            if self.verify and self.xxh.digest() != stored_crc:
                raise FrameError("content checksum mismatch")
            self._check_content_size()
            self.state = "header"
            self.finished = True
            return True
        return False

    def _check_content_size(self):
        if self.info and self.info.content_size is not None:
            if self._frame_produced != self.info.content_size:
                raise FrameError("content size mismatch")
