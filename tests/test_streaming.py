"""Streaming compression/decompression: the fuzzer.c scenario ports.

Scenarios modeled on tests/fuzzer.c:
- double-buffer compression (:492-570): alternating buffers, window chains
  across calls, saveDict between them;
- ring-buffer decompression (:612-700): small bounded decoder history;
- remote/external dictionary (:870-935): dict in a separate buffer for
  both compression and decompression;
- bounded memory: a stream much longer than the window compresses in
  O(window) resident state (Lizard_saveDict's real job);
- partial decode early-exit (Lizard_decompress_safe_partial).
"""

import pytest

from lizard_tpu.format.constants import LIZARD_DICT_SIZE
from lizard_tpu.ref.block_decode import CorruptError, decompress
from lizard_tpu.streaming import (CompressStream, DecompressStream,
                                  decompress_partial, decompress_using_dict)
from lizard_tpu.utils.datagen import gen


def _chunks(data, size):
    return [data[i:i + size] for i in range(0, len(data), size)]


@pytest.mark.parametrize("level", (11, 17))
def test_double_buffer_roundtrip(level):
    """fuzzer.c:492-570: compress in chunks, decode stream-by-stream;
    each stream's matches may reach the previous chunks' window."""
    data = gen(200_000, 11, proba=0.65)
    cs = CompressStream(level)
    ds = DecompressStream()
    out = bytearray()
    for chunk in _chunks(data, 30_000):
        comp = cs.compress_continue(chunk)
        out += ds.decompress_continue(comp, len(chunk))
    assert bytes(out) == data


def test_chained_streams_actually_chain():
    """A second chunk's compressed form must be able to reference the
    first chunk (i.e., it compresses better than a fresh stream)."""
    block = gen(40_000, 3, proba=0.5)
    cs = CompressStream(11)
    cs.compress_continue(block)
    chained = cs.compress_continue(block)       # identical content again
    fresh = CompressStream(11).compress_continue(block)
    assert len(chained) < len(fresh) * 0.5


def test_save_dict_rebase_keeps_window_valid():
    data = gen(150_000, 5, proba=0.6)
    cs = CompressStream(11)
    ds = DecompressStream()
    out = bytearray()
    for i, chunk in enumerate(_chunks(data, 25_000)):
        comp = cs.compress_continue(chunk)
        out += ds.decompress_continue(comp, len(chunk))
        if i % 2 == 1:
            kept = cs.save_dict(16_384)
            assert len(kept) <= 16_384
    assert bytes(out) == data


def test_bounded_memory_long_stream():
    """Resident window state stays <= 2*window regardless of stream
    length (level 11 window = 64 KB)."""
    cs = CompressStream(11)
    ds = DecompressStream(max_history=1 << 16)
    window = cs.window
    total = bytearray()
    for seed in range(10):
        chunk = gen(50_000, seed, proba=0.55)
        total += chunk
        comp = cs.compress_continue(chunk)
        got = ds.decompress_continue(comp, len(chunk))
        assert got == chunk
        assert len(cs.buf) <= 2 * window + 50_000
    assert len(ds.history) <= 1 << 16


def test_external_dict_compress_decompress():
    """fuzzer.c:870-935: dictionary living in its own buffer."""
    dict_data = gen(30_000, 21, proba=0.6)
    payload = dict_data[5_000:15_000] + gen(5_000, 22, proba=0.4)

    cs = CompressStream(11, dict_data=dict_data)
    comp = cs.compress_continue(payload)
    # the dict must be reachable: compressing the same payload without it
    # is measurably worse
    bare = CompressStream(11).compress_continue(payload)
    assert len(comp) < len(bare)

    got = decompress_using_dict(comp, len(payload), dict_data)
    assert got == payload


def test_set_external_dict_switches_window():
    dict_a = gen(20_000, 31, proba=0.6)
    dict_b = gen(20_000, 32, proba=0.6)
    payload = dict_b[2_000:12_000]
    cs = CompressStream(11, dict_data=dict_a)
    cs.set_external_dict(dict_b)
    comp = cs.compress_continue(payload)
    assert decompress_using_dict(comp, len(payload), dict_b) == payload


def test_ring_buffer_decode_small_history():
    """lib/lizard_decompress.h:118-134: a decoder whose retained history
    is exactly one window still decodes a chained stream."""
    data = gen(120_000, 41, proba=0.6)
    cs = CompressStream(11)
    ds = DecompressStream(max_history=1 << 16)  # exactly windowSize
    out = bytearray()
    for chunk in _chunks(data, 8 * 1024):       # 8 KB ring granularity
        comp = cs.compress_continue(chunk)
        out += ds.decompress_continue(comp, len(chunk))
    assert bytes(out) == data


def test_partial_decode_early_exit():
    data = gen(300_000, 51, proba=0.6)  # 3 inner blocks
    from lizard_tpu.ref.block_encode import compress
    comp = compress(data, 11)

    for target in (0, 1, 100, 65_536, 299_999, 300_000, 400_000):
        got = decompress_partial(comp, target, 310_000)
        assert got == data[:target]

    # early exit means a truncated later block is never parsed
    bad = comp[:-10]
    got = decompress_partial(bad, 1000, 310_000)
    assert got == data[:1000]
    with pytest.raises(CorruptError):
        decompress(bad, 310_000)


def test_partial_decode_with_dict():
    dict_data = gen(30_000, 61, proba=0.6)
    payload = dict_data[1_000:11_000]
    cs = CompressStream(11, dict_data=dict_data)
    comp = cs.compress_continue(payload)
    got = decompress_partial(comp, 5_000, 20_000, dict_data=dict_data)
    assert got == payload[:5_000]


def test_profiling_stage_timers():
    from lizard_tpu.utils import profiling
    profiling.reset()
    with profiling.stage("x"):
        pass
    with profiling.stage("x"):
        pass
    rep = profiling.report(reset=True)
    assert "x" in rep and "n=2" in rep
    assert profiling.report() == ""
