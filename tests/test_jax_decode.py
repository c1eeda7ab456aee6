"""JAX batched decode vs the scalar oracle (CPU backend; the same code runs
on TPU — verified separately on hardware)."""

import numpy as np
import pytest

from lizard_tpu.ops.decode import decode_batch, decompress_jax
from lizard_tpu.ops.split import finalize, new_accumulator, split_stream
from lizard_tpu.ref.block_encode import compress
from lizard_tpu.utils.datagen import gen, text_like


def _cases():
    return [
        gen(20_000, 2),
        text_like(30_000, 4),
        bytes(4000),                      # overlap-heavy rep matches
        np.random.default_rng(9).integers(0, 256, 5000).astype(np.uint8).tobytes(),
        gen(300_000, 3),                  # inner-block window crossing
        b"abcd" * 6,
        b"",
    ]


@pytest.mark.parametrize("level", [10, 17, 21, 29, 35, 45])
def test_jax_decode_roundtrip(level):
    for data in _cases():
        comp = compress(data, level)
        assert decompress_jax(comp, max_out=len(data)) == data


def test_jax_decode_multistream_batch():
    """Multiple independent streams in one batch: outputs concatenate in
    order, windows stay per-stream."""
    datas = [gen(9_000, s) for s in range(5)]
    acc = new_accumulator()
    fam = None
    for i, d in enumerate(datas):
        fam = split_stream(compress(d, 14), acc, i)
    batch = finalize(acc, fam)
    total = sum(len(d) for d in datas)
    out, blk_len = decode_batch(batch, total)
    assert bytes(out[:int(blk_len.sum())]) == b"".join(datas)


def test_jax_decode_liz_rep_offsets():
    # data engineered to exercise rep-offset tokens heavily
    base = (b"pattern-one!" * 40 + b"X" + b"pattern-one!" * 40) * 8
    comp = compress(base, 25)
    assert decompress_jax(comp, max_out=len(base)) == base


def test_jax_decode_long_matches():
    # token-31 (ext ML >= 47) and LZ4 ext lengths
    data = b"Z" * 100_000
    for level in (10, 21):
        comp = compress(data, level)
        assert decompress_jax(comp, max_out=len(data)) == data
