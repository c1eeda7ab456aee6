"""Property fuzzer, the equivalent of tests/fuzzer.c: randomized cycles over
slices of a synthetic buffer; round-trip, output-budget, truncation,
corruption, partial decode, and streaming-continuation invariants."""

import numpy as np
import pytest

from lizard_tpu.ref.block_decode import CorruptError, decompress
from lizard_tpu.ref.block_encode import compress
from lizard_tpu.streaming import (
    CompressStream,
    DecompressStream,
    decompress_partial,
    decompress_using_dict,
)
from lizard_tpu.utils.datagen import gen

import os

# reference default is 65536 cycles with CI at -T3mn (tests/fuzzer.c:60,
# tests/Makefile:66); 150 oracle cycles keep this module under ~1 min
N_CYCLES = int(os.environ.get("LIZARD_FUZZ_CYCLES", "150"))


@pytest.fixture(scope="module")
def corpus():
    return gen(2 << 20, seed=42, proba=0.6)


def test_fuzz_cycles(corpus):
    rng = np.random.default_rng(7)
    levels = list(range(10, 50))
    for cycle in range(N_CYCLES):
        size = int(rng.integers(1, 128 * 1024))
        start = int(rng.integers(0, len(corpus) - size))
        block = corpus[start:start + size]
        level = int(levels[rng.integers(0, len(levels))])
        if level in range(18, 20) or level in range(26, 30) or level >= 46:
            size = min(size, 8192)  # optimal parser is slow in the oracle
            block = block[:size]

        comp = compress(block, level)

        # output-budget matrix (fuzzer.c:377-440): exact and +1 budgets
        # succeed with identical output; -1 must fail with CorruptError,
        # never crash and never return silently-truncated data.
        assert decompress(comp, max_out=size) == block
        assert decompress(comp, max_out=size + 1) == block
        if size > 0:
            with pytest.raises(CorruptError):
                decompress(comp, max_out=size - 1)
        # truncated input must never round-trip
        if len(comp) > 2:
            cut = int(rng.integers(1, len(comp)))
            try:
                got = decompress(comp[:cut], max_out=size)
                assert got != block
            except CorruptError:
                pass
        # single-byte corruption: the decoder must either detect it
        # (CorruptError -- the ONLY acceptable exception) or decode to
        # different bytes than the original. Any other exception is a
        # decoder bug; silent equality means the flip was load-bearing-free
        # (possible only in unreferenced padding, which Lizard has none of
        # past the level byte).
        bad = bytearray(comp)
        pos = int(rng.integers(1, len(bad)))
        bad[pos] ^= 0xFF
        try:
            got = decompress(bytes(bad), max_out=size)
        except CorruptError:
            pass
        else:
            assert got != block, \
                f"cycle {cycle}: flipped byte {pos} of {len(bad)} " \
                f"was silently ignored (level {level}, size {size})"


def test_partial_decode(corpus):
    block = corpus[:50_000]
    comp = compress(block, 17)
    for target in (0, 1, 100, 25_000, 50_000):
        got = decompress_partial(comp, target, 50_000)
        assert got == block[:len(got)]
        assert len(got) >= min(target, 50_000) or len(got) == 50_000


def test_streaming_double_buffer(corpus):
    """Double-buffer streaming: compress chunks with window continuity,
    decode with chained windows (fuzzer.c FUZ_unitTests scenario)."""
    cs = CompressStream(level=14)
    ds = DecompressStream()
    pos = 0
    rng = np.random.default_rng(3)
    while pos < 300_000:
        n = int(rng.integers(1, 70_000))
        chunk = corpus[pos:pos + n]
        if not chunk:
            break
        comp = cs.compress_continue(chunk)
        out = ds.decompress_continue(comp, len(chunk))
        assert out == chunk
        pos += n


def test_decompress_using_dict(corpus):
    """Dictionary decompression: compress [dict+data], decode data with the
    dict provided separately (prefix mode)."""
    dict_data = corpus[:30_000]
    data = corpus[30_000:80_000]
    cs = CompressStream(level=15)
    cs.compress_continue(dict_data)
    comp = cs.compress_continue(data)
    got = decompress_using_dict(comp, len(data), dict_data)
    assert got == data


def test_malicious_lengths_rejected():
    """Crafted headers with overflowing literal/match lengths must be
    rejected, not crash (fuzzer.c FUZ_AddressOverflow spirit)."""
    # level byte + block header 0 + 5 streams claiming absurd lengths
    evil = bytes([17, 0]) + b"\xff\xff\xff" * 5
    with pytest.raises(CorruptError):
        decompress(evil, max_out=1 << 20)
    # LZ4 token demanding a huge literal run with a tiny literal stream
    evil2 = bytes([10, 0,
                   0, 0, 0,      # len stream: empty
                   0, 0, 0,      # off16: empty
                   0, 0, 0,      # off24: empty
                   1, 0, 0, 0x0F,  # flags: one token, ll=15 (ext)
                   4, 0, 0]) + bytes([255, 255, 255, 255])  # literals: ext=LE24 max
    with pytest.raises(CorruptError):
        decompress(evil2, max_out=1 << 20)


def test_budget_exact_compression(corpus):
    """Compressing into an exact-size budget must succeed; the reference's
    budget-1 must fail. Our encoder is unbudgeted, so assert the analogous
    property: output never exceeds compressBound."""
    from lizard_tpu.format.constants import compress_bound
    for level in (10, 17, 21, 35):
        for n in (1, 100, 65536, 200_000):
            block = corpus[:n]
            comp = compress(block, level)
            assert len(comp) <= compress_bound(n)


# --------------------------------------------------------------------------
# budget-exact compression (tests/fuzzer.c:377-440) + canary overrun checks
# --------------------------------------------------------------------------

def test_budget_exact_compress():
    """compress with max_out == exact size succeeds; max_out-1 fails
    (Lizard_compress maxDstSize contract, lizard_compress.c:583-599)."""
    from lizard_tpu.api import compress
    from lizard_tpu.utils.datagen import gen
    import pytest as _pytest
    for level in (11, 21, 35, 41):
        data = gen(60_000, level, proba=0.6)
        exact = len(compress(data, level))
        assert len(compress(data, level, max_out=exact)) == exact
        with _pytest.raises(ValueError):
            compress(data, level, max_out=exact - 1)


def test_budget_exact_native_with_canary():
    """The native encoder must never write past the declared capacity:
    canary bytes after the budget stay intact on success AND failure."""
    import ctypes
    from lizard_tpu import runtime
    from lizard_tpu.utils.datagen import gen
    if not runtime.available():
        import pytest as _pytest
        _pytest.skip("native runtime not built")
    lib = runtime._load()
    data = gen(60_000, 3, proba=0.6)
    for level in (11, 21, 41):
        exact = len(runtime.compress(data, level))
        for budget in (exact, exact - 1, exact // 2, 8):
            buf = ctypes.create_string_buffer(budget + 16)
            canary = b"\xAA" * 16
            buf.raw  # materialize
            ctypes.memmove(ctypes.byref(buf, budget), canary, 16)
            r = lib.ltpu_compress(data, len(data), buf, budget, level, 1)
            assert bytes(buf.raw[budget:budget + 16]) == canary, \
                f"overrun at level {level} budget {budget}"
            if budget >= exact:
                assert r == exact
            else:
                assert r == -1


def test_decode_budget_canary_native():
    """Native decoder: dst capacity is a hard wall (fuzzer.c's overrun
    class applied to decompression)."""
    import ctypes
    from lizard_tpu import runtime
    from lizard_tpu.utils.datagen import gen
    if not runtime.available():
        import pytest as _pytest
        _pytest.skip("native runtime not built")
    lib = runtime._load()
    data = gen(50_000, 9, proba=0.6)
    comp = runtime.compress(data, 11)
    for cap in (len(data), len(data) - 1, len(data) // 2, 1):
        buf = ctypes.create_string_buffer(cap + 16)
        ctypes.memmove(ctypes.byref(buf, cap), b"\xBB" * 16, 16)
        r = lib.ltpu_decompress(comp, len(comp), buf, cap)
        assert bytes(buf.raw[cap:cap + 16]) == b"\xBB" * 16, f"cap {cap}"
        if cap >= len(data):
            assert r == len(data)
        else:
            assert r < 0


# --------------------------------------------------------------------------
# randomized-prefs frame loop (tests/frametest.c:546-720)
# --------------------------------------------------------------------------

def test_frametest_randomized_prefs():
    """Random preferences x random granularities through the incremental
    encoder/decoder, every iteration round-trip checked."""
    import random
    from lizard_tpu.frame import FrameDecoder, FrameEncoder
    from lizard_tpu.utils.datagen import gen

    rnd = random.Random(0x1EAF)
    base = gen(200_000, 5, proba=0.6)
    for it in range(25):
        level = rnd.choice((10, 11, 14, 17, 21, 25, 35, 41))
        bsid = rnd.choice((1, 2, 3, 4))
        linked = rnd.random() < 0.4
        crc = rnd.random() < 0.7
        size = rnd.randrange(0, len(base))
        data = base[:size]
        declare = rnd.random() < 0.3
        enc = FrameEncoder(level=level, block_size_id=bsid,
                           block_linked=linked, content_checksum=crc,
                           content_size=size if declare else None)
        frame = bytearray(enc.begin())
        pos = 0
        while pos < size:
            n = rnd.randrange(1, 80_000)
            frame += enc.update(data[pos:pos + n])
            pos += n
            if rnd.random() < 0.15:
                frame += enc.flush()
        frame += enc.end()

        dec = FrameDecoder()
        out = bytearray()
        pos = 0
        while pos < len(frame):
            n = rnd.randrange(1, 60_000)
            out += dec.update(bytes(frame[pos:pos + n]))
            pos += n
        assert bytes(out) == data, \
            f"it={it} level={level} bsid={bsid} linked={linked}"
        assert dec.finished
