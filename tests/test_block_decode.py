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


def test_stream_leftover_parity_with_reference():
    """The reference's block-end 'input must be consumed' check
    (lizard_decompress_liz.h:204-206) covers only the literals stream; extra
    unread bytes in off16/off24 are ACCEPTED by liblizard (verified against
    the built reference). Our decoder must match — not be stricter — so
    streams the reference decodes also decode here."""
    o = require_oracle()
    from lizard_tpu.ref.block_decode import _le24

    data = b"hello world, " * 500
    comp = o.compress(data, 21)
    p = 1
    hdr = comp[p]
    p += 1
    assert hdr & 0x04 == 0  # not an uncompressed block
    p += 3 + _le24(comp, p)  # skip len stream
    off16_len = _le24(comp, p)  # off16 stream header (raw at level 21)
    mod = bytearray(comp)
    mod[p:p + 3] = (off16_len + 2).to_bytes(3, "little")
    mod[p + 3 + off16_len:p + 3 + off16_len] = b"\xaa\xbb"
    mod = bytes(mod)

    ref_out = o.decompress(mod, len(data))
    assert ref_out == data  # reference accepts the leftover bytes
    assert decompress(mod, max_out=len(data)) == data  # so must we
