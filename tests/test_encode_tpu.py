"""TPU-native fastLZ4 encoder (ops/encode_tpu.py): validity, interop,
frame round trips. Runs the XLA pipeline on the CPU backend (conftest
forces it); the same program runs unmodified on the TPU."""

import numpy as np
import pytest

from lizard_tpu.ops.encode_tpu import encode_blocks_tpu, encode_streams_tpu
from lizard_tpu.ref.block_decode import decompress
from lizard_tpu.utils.datagen import gen, text_like


def _roundtrip(d, level=10):
    e = encode_blocks_tpu([d], level=level)[0]
    assert bytes(decompress(e, max_out=len(d))) == d
    return e


def test_basic_block():
    d = gen(131072, 1, proba=0.6)
    e = _roundtrip(d)
    assert len(e) < len(d)


def test_text_like_ratio():
    d = text_like(131072, 2)
    e = _roundtrip(d)
    assert len(e) < 0.8 * len(d)


def test_small_and_edge_sizes():
    for size in (1, 3, 19, 20, 21, 64, 511, 513, 65536):
        d = gen(size, size, proba=0.5)
        _roundtrip(d)


def test_zeros_and_runs():
    _roundtrip(b"\0" * 131072)
    _roundtrip((b"A" * 5000 + b"xyz") * 20)
    _roundtrip(b"abcdabcdabcd" * 1000)


def test_incompressible_falls_back_uncompressed():
    d = np.random.default_rng(0).integers(0, 256, 131072,
                                          np.uint8).tobytes()
    e = _roundtrip(d)
    # level byte + flag + 3-byte size + payload
    assert len(e) == len(d) + 5


def test_batch_matches_single():
    ds = [gen(131072, s, proba=0.55) for s in range(3)]
    batch = encode_blocks_tpu(ds)
    singles = [encode_blocks_tpu([d])[0] for d in ds]
    assert batch == singles


def test_multi_inner_block_stream():
    d = gen(300 * 1024, 9, proba=0.6)
    s = encode_streams_tpu([d], level=11)[0]
    assert s[0] == 11
    assert bytes(decompress(s, max_out=len(d))) == d


def test_oversize_block_rejected():
    with pytest.raises(ValueError):
        encode_blocks_tpu([b"x" * 131073])


def test_frame_roundtrip():
    from lizard_tpu.frame import compress_frame_tpu, decompress_frame
    d = gen(300 * 1024, 4, proba=0.6)
    f = compress_frame_tpu(d, 11, block_size_id=1)
    assert decompress_frame(f) == d


def test_frame_level_clamp_and_engine_guard():
    from lizard_tpu.frame import compress_frame_tpu, decompress_frame
    # out-of-range levels clamp (Lizard_verifyCompressionLevel)
    f = compress_frame_tpu(b"x" * 100, 50)
    assert decompress_frame(f) == b"x" * 100
    with pytest.raises(ValueError):
        compress_frame_tpu(b"x" * 100, 21, engine="xla")  # LIZv1 on xla


def test_liblizard_interop():
    oracle = pytest.importorskip("tests.oracle")
    lib = oracle._load()
    if lib is None:
        pytest.skip("reference library unavailable")
    o = oracle.Oracle(lib)
    for seed, size in ((0, 131072), (1, 70000), (2, 131072)):
        d = gen(size, seed, proba=0.55 + 0.1 * seed)
        e = encode_blocks_tpu([d])[0]
        assert o.decompress(e, len(d)) == d
