"""Encoder parity: our compressed output must be byte-identical to the
reference at every level (=> exact size parity), and must round-trip."""

import numpy as np
import pytest

from lizard_tpu.ref.block_decode import decompress
from lizard_tpu.ref.block_encode import compress
from lizard_tpu.utils.datagen import gen, text_like
from tests.oracle import require_oracle


def _corpus(small=False):
    c = [
        b"",
        b"a",
        b"abcd" * 6,
        bytes(1000),
        np.random.default_rng(9).integers(0, 256, 5000).astype(np.uint8).tobytes(),
        gen(30_000 if small else 60_000, seed=3),
        text_like(20_000 if small else 50_000, seed=4),
    ]
    if not small:
        c.append(gen(200_000, seed=5))  # multi-block
    return c


FAST_LEVELS = [10, 11, 12, 13, 14, 15, 16, 17, 20, 21, 22, 23, 24, 25]
OPT_LEVELS = [18, 26, 29]  # optimal parser is slow in the scalar oracle


@pytest.mark.parametrize("level", FAST_LEVELS)
def test_encode_identical_fast_levels(level):
    o = require_oracle()
    for data in _corpus():
        assert compress(data, level) == o.compress(data, level), \
            f"level {level}, len {len(data)}"


@pytest.mark.parametrize("level", OPT_LEVELS)
def test_encode_identical_optimal_levels(level):
    o = require_oracle()
    for data in _corpus(small=True):
        assert compress(data, level) == o.compress(data, level), \
            f"level {level}, len {len(data)}"


@pytest.mark.slow
@pytest.mark.parametrize("level", list(range(10, 30)))
def test_encode_identical_all_nonhuff(level):
    o = require_oracle()
    for data in _corpus(small=True):
        assert compress(data, level) == o.compress(data, level)


def test_roundtrip_own_codec():
    for level in (10, 17, 23, 29):
        for data in _corpus(small=True):
            comp = compress(data, level)
            assert decompress(comp, max_out=len(data)) == data


def test_cross_decode_by_reference():
    """Reference must decode our output (interop, the other direction)."""
    o = require_oracle()
    for level in (10, 14, 21, 26):
        data = gen(30_000, seed=11)
        comp = compress(data, level)
        assert o.decompress(comp, len(data)) == data


HUFF_FAST_LEVELS = [30, 31, 32, 33, 34, 35, 36, 37, 38, 40, 41, 42, 43, 44, 45]


@pytest.mark.parametrize("level", HUFF_FAST_LEVELS)
def test_encode_identical_huff_levels(level):
    o = require_oracle()
    for data in _corpus(small=True):
        assert compress(data, level) == o.compress(data, level), \
            f"level {level}, len {len(data)}"


@pytest.mark.parametrize("level", [39, 46, 49])
def test_encode_identical_huff_optimal_levels(level):
    o = require_oracle()
    data = text_like(25_000, seed=4)
    assert compress(data, level) == o.compress(data, level)
    data = gen(25_000, seed=8, proba=0.5)
    assert compress(data, level) == o.compress(data, level)


@pytest.mark.slow
@pytest.mark.parametrize("level", list(range(30, 50)))
def test_encode_identical_all_huff(level):
    o = require_oracle()
    for data in _corpus(small=True):
        assert compress(data, level) == o.compress(data, level)
