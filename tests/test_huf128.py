"""Lane-packed Huff0 decoder (ops/huf128.py) vs the bit-exact oracle,
CPU interpret mode. Interpret runs of the 8-super-unrolled kernel take
minutes each, so the heavier cases are --run-slow; the production-geometry
hardware parity sweep lives in test_lane_hw.py (test_huf128_hardware)."""

import numpy as np
import pytest

from lizard_tpu.ref.huf_encode import huf_compress
from lizard_tpu.utils.datagen import gen, text_like


def _blobs(specs):
    """specs: list of (data). Returns ([(blob, dst)], [data])."""
    blobs, datas = [], []
    for d in specs:
        c = huf_compress(d)
        assert c is not None and len(c) > 1, "corpus must be compressible"
        blobs.append((c, len(d)))
        datas.append(d)
    return blobs, datas


def _check(specs, groups=1, il=1):
    from lizard_tpu.ops.huf128 import huf_decompress_128
    blobs, datas = _blobs(specs)
    outs = huf_decompress_128(blobs, groups=groups, il=il, interpret=True)
    for i, (got, want) in enumerate(zip(outs, datas)):
        assert got == want, (
            f"blob {i}: first diff at "
            f"{next((k for k in range(min(len(got), len(want))) if got[k] != want[k]), 'len')} "
            f"lens {len(got)}/{len(want)}")


def test_single_blob():
    _check([text_like(3000, 1)])


def test_multiple_blobs_mixed():
    """One kernel call covering the core scheduling paths in the default
    (interpret) run: mixed sizes, one ~9 KB blob whose streams span
    multiple 8-super episodes (block-boundary pos/fill/trk carry), and
    33 blobs = 132 streams > 128 cells at groups=1 so at least one cell
    chains two streams. Tracing dominates interpret cost, so folding
    these into one case is ~4 min cheaper than separate cases."""
    specs = [text_like(2000, 2), gen(1500, 3, proba=0.8),
             text_like(4096, 4), bytes(range(13)) * 150,
             text_like(9200, 6)]
    specs += [text_like(300 + 7 * i, 100 + i) for i in range(28)]
    _check(specs)


@pytest.mark.slow
def test_sizes_odd():
    _check([text_like(n, n) for n in (515, 1000, 2049, 700)])


def test_rle_blob_host_path():
    from lizard_tpu.ops.huf128 import huf_decompress_128
    blobs, datas = _blobs([text_like(2000, 5)])
    blobs.append((b"z", 100))
    outs = huf_decompress_128(blobs, groups=1, il=1, interpret=True)
    assert outs[0] == datas[0]
    assert outs[1] == b"z" * 100


@pytest.mark.slow
def test_multi_row_streams():
    # streams spanning several 512 B output rows + backing rows
    _check([text_like(9000, 7), text_like(12000, 8)])


@pytest.mark.slow
def test_skewed_weights():
    d = (b"a" * 4000 + b"b" * 300 + b"c" * 40 + bytes(range(64)))
    _check([d])
