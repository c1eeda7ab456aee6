"""Lane-parallel Huff0 decoder vs the oracle (CPU interpret mode)."""

import numpy as np
import pytest

from lizard_tpu.ref.huf import huf_decompress
from lizard_tpu.ref.huf_encode import huf_compress
from lizard_tpu.utils.datagen import gen


def _blobs(datas):
    blobs = []
    for d in datas:
        c = huf_compress(d)
        assert c and len(c) < len(d), "input not compressible enough"
        assert huf_decompress(c, len(d)) == d
        blobs.append((c, len(d)))
    return blobs


def roundtrip(datas, groups=1, il=1):
    from lizard_tpu.ops.lane_huf import huf_decompress_lanes
    blobs = _blobs(datas)
    outs = huf_decompress_lanes(blobs, groups=groups, il=il, interpret=True)
    for i, (want, got) in enumerate(zip(datas, outs)):
        assert got == want, (
            f"blob {i} len {len(want)}: first diff "
            f"{next((k for k in range(min(len(got), len(want))) if got[k] != want[k]), 'len')}")


def _texty(n, seed):
    rng = np.random.default_rng(seed)
    # skewed byte distribution so Huffman compresses
    syms = rng.choice(np.frombuffer(b"etaoin shrdlu\n.,", np.uint8),
                      size=n, p=None)
    return syms.tobytes()


def test_single_blob():
    roundtrip([_texty(3000, 1)])


def test_multiple_blobs_sizes():
    datas = [_texty(500 + 711 * i, 10 + i) for i in range(7)]
    roundtrip(datas)


def test_rle_and_degenerate():
    from lizard_tpu.ops.lane_huf import huf_decompress_lanes
    d = _texty(2000, 3)
    blobs = _blobs([d])
    blobs.append((b"\x41", 100))  # RLE blob
    outs = huf_decompress_lanes(blobs, groups=1, il=1, interpret=True)
    assert outs[0] == d
    assert outs[1] == b"A" * 100


def test_interleaved():
    datas = [_texty(1000 + 333 * i, 20 + i) for i in range(6)]
    roundtrip(datas, groups=2, il=2)
