"""Incremental frame compression (FrameEncoder) + bounded-memory decode.

Mirrors lizard_frame.c:501-629 (Begin/Update/Flush/End with tmpIn
buffering) and the frametest.c multi-granularity loops."""

import pytest

from lizard_tpu import runtime
from lizard_tpu.frame import (FrameDecoder, FrameEncoder, FrameError,
                              compress_frame, decompress_frame)
from lizard_tpu.utils.datagen import gen


def _stream_compress(data, chunk, **kw):
    enc = FrameEncoder(**kw)
    out = bytearray(enc.begin())
    for i in range(0, len(data), chunk):
        out += enc.update(data[i:i + chunk])
    out += enc.end()
    return bytes(out)


def test_incremental_identical_to_oneshot():
    """blockIndependent ref frames match the one-shot path byte-for-byte
    whatever the update granularity."""
    data = gen(150_000, 1, proba=0.6)
    ref = compress_frame(data, 14, block_size_id=1)
    for chunk in (1, 7, 1000, 65_536, 200_000):
        got = _stream_compress(data, chunk, level=14, block_size_id=1)
        assert got == ref, f"chunk={chunk}"


def test_incremental_roundtrip_all_modes():
    data = gen(300_000, 2, proba=0.55)
    for kw in (dict(level=14), dict(level=14, block_linked=True),
               dict(level=21), dict(level=21, block_linked=True),
               dict(level=14, content_checksum=False)):
        frame = _stream_compress(data, 50_000, **kw)
        assert decompress_frame(frame) == data, kw


def test_linked_mode_actually_links():
    """Linked frames must compress repeated cross-block content better
    than independent ones."""
    block = gen(131_072, 3, proba=0.15)  # one full frame block, low
    data = block * 3                     # redundancy except across blocks
    kw = dict(level=21, block_size_id=1)  # window 4 MB >> block size
    linked = _stream_compress(data, 30_000, block_linked=True, **kw)
    indep = _stream_compress(data, 30_000, **kw)
    assert len(linked) < len(indep) * 0.7
    assert decompress_frame(linked) == data


def test_flush_forces_partial_block():
    data = gen(10_000, 4, proba=0.6)
    enc = FrameEncoder(level=14)
    header = enc.begin()
    out = bytearray(header)
    out += enc.update(data)
    assert len(out) == len(header)  # nothing emitted yet (< block size)
    mid = enc.flush()
    assert mid  # partial block forced out
    out += mid
    out += enc.update(data)
    out += enc.end()
    assert decompress_frame(bytes(out)) == data + data


def test_content_size_declared():
    data = gen(5_000, 5, proba=0.6)
    frame = _stream_compress(data, 1000, level=14, content_size=len(data))
    assert decompress_frame(frame) == data
    enc = FrameEncoder(level=14, content_size=999)
    enc.begin()
    enc.update(data)
    with pytest.raises(FrameError):
        enc.end()


@pytest.mark.skipif(not runtime.available(), reason="native runtime")
def test_native_backend_streaming():
    data = gen(400_000, 6, proba=0.6)
    for level in (11, 21, 41):
        frame = _stream_compress(data, 70_000, level=level,
                                 backend="native")
        assert decompress_frame(frame) == data


def test_bounded_memory_both_directions():
    """A stream many times the window size keeps encoder + decoder state
    bounded (constant-memory file IO depends on this)."""
    enc = FrameEncoder(level=11, block_linked=True)
    dec = FrameDecoder()
    out = bytearray(dec.update(enc.begin()))
    total = bytearray()
    for seed in range(12):
        chunk = gen(80_000, seed, proba=0.55)
        total += chunk
        out += dec.update(enc.update(chunk))
        assert len(enc._cs.buf) <= 2 * enc._cs.window + 131_072
        assert len(dec.out) <= (1 << 24) + 131_072
    out += dec.update(enc.end())
    assert bytes(out) == bytes(total)
    assert dec.finished


def test_decoder_trim_does_not_break_checksum():
    data = gen(600_000, 9, proba=0.6)
    frame = compress_frame(data, 14, block_size_id=1)  # independent
    dec = FrameDecoder()
    out = bytearray()
    for i in range(0, len(frame), 33):
        out += dec.update(frame[i:i + 33])
    assert bytes(out) == data
    assert dec.finished


@pytest.mark.slow
def test_gigabyte_stream_bounded_memory():
    """1 GB through the incremental encoder + resumable decoder in 1 MB
    chunks with O(window) memory — the reference tests 6 GB streams in
    bounded memory (tests/Makefile:229-232); this is the scaled CI-able
    equivalent (marked slow, ~2-4 min with the native backend)."""
    import resource

    from lizard_tpu import runtime
    from lizard_tpu.frame import FrameDecoder, FrameEncoder
    if not runtime.available():
        pytest.skip("native runtime unavailable (oracle would take hours)")

    import numpy as np
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    CHUNK = 1 << 20
    N = 1 << 30
    base = np.frombuffer(
        (b"the quick brown fox jumps over the lazy dog %d " % 7) * 40_000,
        np.uint8)[:CHUNK].copy()
    def make_chunk(pos):
        chunk = base.copy()
        chunk[:8] = np.frombuffer(pos.to_bytes(8, "little"), np.uint8)
        return chunk.tobytes()

    def expect(pos0, ln):
        """Regenerate stream bytes [pos0, pos0+ln) without holding the
        stream (memory-bounded verification)."""
        parts = []
        p = pos0
        while p < pos0 + ln:
            c0 = (p // CHUNK) * CHUNK
            part = make_chunk(c0)[p - c0:p - c0 + (pos0 + ln - p)]
            parts.append(part)
            p += len(part)
        return b"".join(parts)

    enc = FrameEncoder(level=11, block_size_id=4, content_checksum=True,
                       backend="native")
    dec = FrameDecoder()
    total_out = 0
    comp_total = 0
    pos = 0
    while pos < N:
        b = make_chunk(pos)
        comp = (enc.begin() if pos == 0 else b"") + enc.update(b)
        comp_total += len(comp)
        out = dec.update(comp)
        if out:
            assert out == expect(total_out, len(out))
            total_out += len(out)
        pos += CHUNK
    tail = enc.end()
    comp_total += len(tail)
    out = dec.update(tail)
    if out:
        assert out == expect(total_out, len(out))
        total_out += len(out)
    assert dec.finished
    assert total_out == N
    assert comp_total < N // 2
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # O(window) bound: peak RSS growth stays far below the 1 GB stream
    # (window 16 MB + tmp buffers + allocator slack)
    assert rss1 - rss0 < 700_000, f"RSS grew {rss1 - rss0} KB"
