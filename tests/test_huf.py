"""Huff0/FSE decode oracle vs the reference entropy backend."""

import ctypes

import numpy as np
import pytest

from lizard_tpu.ref.block_decode import decompress
from lizard_tpu.ref.huf import HufError, huf_decompress
from lizard_tpu.utils.datagen import gen, text_like
from tests.oracle import require_oracle


def _huf_compress_ref(o, data: bytes) -> bytes:
    lib = o.lib
    lib.HUF_compress.restype = ctypes.c_size_t
    lib.HUF_isError.restype = ctypes.c_uint
    bound = len(data) + 512
    dst = ctypes.create_string_buffer(bound)
    n = lib.HUF_compress(dst, bound, data, len(data))
    assert not lib.HUF_isError(n)
    return dst.raw[:n] if n else b""


@pytest.mark.parametrize("kind,seed", [("text", 1), ("text", 2), ("gen", 3), ("skew", 4)])
@pytest.mark.parametrize("n", [1500, 5000, 60000, 128 * 1024])
def test_huf_roundtrip_vs_reference(kind, seed, n):
    o = require_oracle()
    rng = np.random.default_rng(seed)
    if kind == "text":
        data = text_like(n, seed)[:n]
    elif kind == "gen":
        data = gen(n, seed)
    else:  # heavily skewed bytes
        data = (rng.zipf(1.5, n) % 40).astype(np.uint8).tobytes()
    comp = _huf_compress_ref(o, data)
    if not comp or len(comp) >= len(data):
        pytest.skip("incompressible for HUF")
    got = huf_decompress(comp, len(data))
    assert got == data


def test_huf_rle_and_stored():
    assert huf_decompress(b"\x42", 10) == b"\x42" * 10
    assert huf_decompress(b"abc", 3) == b"abc"
    with pytest.raises(HufError):
        huf_decompress(b"abcd", 3)


@pytest.mark.parametrize("level", [30, 31, 35, 39, 41, 45, 49])
def test_decode_reference_output_huff_levels(level):
    o = require_oracle()
    for data in [text_like(60_000, seed=6), gen(150_000, seed=7, proba=0.4),
                 gen(300_000, seed=8)]:
        comp = o.compress(data, level)
        got = decompress(comp, max_out=len(data))
        assert got == data, f"level {level}, len {len(data)}"


@pytest.mark.slow
@pytest.mark.parametrize("level", list(range(30, 50)))
def test_decode_reference_output_all_huff(level):
    o = require_oracle()
    for data in [text_like(200_000, seed=10), gen(400_000, seed=11, proba=0.5)]:
        comp = o.compress(data, level)
        assert decompress(comp, max_out=len(data)) == data
