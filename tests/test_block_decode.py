"""Our decoder must bit-exactly decode reference-compressed streams
(the hard compatibility constraint; BASELINE.json)."""

import numpy as np
import pytest

from lizard_tpu.ref.block_decode import CorruptError, decompress
from lizard_tpu.utils.datagen import gen, text_like
from tests.oracle import require_oracle

NON_HUFF_LEVELS = list(range(10, 30))
HUFF_LEVELS = list(range(30, 50))


def _corpus():
    return [
        b"",
        b"a",
        b"abcd" * 6,
        bytes(100),                      # zeros: overlapping rep matches
        gen(1000, seed=1),
        gen(20_000, seed=2),
        gen(200_000, seed=3),            # crosses 128KB inner-block boundary
        text_like(50_000, seed=4),
        np.random.default_rng(9).integers(0, 256, 5000).astype(np.uint8).tobytes(),  # incompressible
    ]


@pytest.mark.parametrize("level", [10, 11, 12, 13, 15, 17, 20, 21, 22, 23, 25, 29])
def test_decode_reference_output(level):
    o = require_oracle()
    for data in _corpus():
        comp = o.compress(data, level)
        got = decompress(comp, max_out=len(data))
        assert got == data, f"level {level}, len {len(data)}"


@pytest.mark.slow
@pytest.mark.parametrize("level", NON_HUFF_LEVELS)
def test_decode_reference_output_all_nonhuff(level):
    o = require_oracle()
    for data in _corpus():
        comp = o.compress(data, level)
        assert decompress(comp, max_out=len(data)) == data


def test_decode_rejects_truncation():
    o = require_oracle()
    data = gen(10_000, seed=7)
    comp = o.compress(data, 17)
    for cut in [2, len(comp) // 2, len(comp) - 1]:
        try:
            got = decompress(comp[:cut], max_out=len(data))
        except CorruptError:
            continue
        assert got != data  # truncated input must never round-trip


def test_decode_rejects_bad_level():
    with pytest.raises(CorruptError):
        decompress(b"\x05\x00\x00\x00")
    with pytest.raises(CorruptError):
        decompress(b"\x63\x00\x00\x00")
