"""HUF encoder parity vs reference HUF_compress."""

import ctypes

import numpy as np
import pytest

from lizard_tpu.ref.huf import huf_decompress
from lizard_tpu.ref.huf_encode import huf_compress
from lizard_tpu.utils.datagen import gen, text_like
from tests.oracle import require_oracle


def _ref_huf(o, data):
    lib = o.lib
    lib.HUF_compress.restype = ctypes.c_size_t
    lib.HUF_isError.restype = ctypes.c_uint
    dst = ctypes.create_string_buffer(len(data) + 1024)
    n = lib.HUF_compress(dst, len(dst), data, len(data))
    assert not lib.HUF_isError(n)
    return dst.raw[:n]


CASES = [
    ("text5k", lambda: text_like(5000, 1)),
    ("text60k", lambda: text_like(60000, 2)),
    ("gen50k", lambda: gen(50000, 3, proba=0.3)),
    ("skew", lambda: (np.random.default_rng(0).zipf(1.5, 30000) % 40).astype(np.uint8).tobytes()),
    ("rle", lambda: b"\x55" * 2000),
    ("rand", lambda: np.random.default_rng(0).integers(0, 256, 5000).astype(np.uint8).tobytes()),
    ("few", lambda: bytes([1, 2, 3, 4] * 5000)),
    ("max", lambda: text_like(131072, 9)[:131072]),
    ("tiny", lambda: b"aabbccdd"),
    ("two", lambda: b"ab" * 600),
]


@pytest.mark.parametrize("name,mk", CASES, ids=[c[0] for c in CASES])
def test_huf_encode_identical(name, mk):
    o = require_oracle()
    data = mk()
    ref = _ref_huf(o, data)
    mine = huf_compress(data)
    mine = mine if mine is not None else b""
    assert ref == mine


def test_huf_encode_roundtrip():
    data = text_like(30000, 5)
    comp = huf_compress(data)
    assert comp is not None
    assert huf_decompress(comp, len(data)) == data
