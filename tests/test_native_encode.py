"""Native C++ encoder (all level families) and native Huff0 compressor.

The native encoder emits valid-but-not-byte-identical streams; these tests
prove validity against BOTH in-repo decoders (Python oracle, native C++)
and, when the reference build is available, cross-implementation interop
with liblizard itself (the reference decoder must accept our streams).
Mirrors the strategy of tests/fuzzer.c:241-340 (compress -> decompress ->
compare) applied to every family the encoder dispatches.
"""

import pytest

from lizard_tpu import runtime
from lizard_tpu.ref.block_decode import decompress as py_decompress
from lizard_tpu.utils.datagen import gen, text_like

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native runtime not built")

LEVELS = (10, 11, 14, 19, 21, 25, 29, 30, 35, 39, 41, 45, 49)


def _corpora():
    return [
        (b"", "empty"),
        (b"a", "one byte"),
        (b"abcd" * 8, "tiny repeat"),
        (gen(100000, 1, proba=0.6), "mixed"),
        (gen(100000, 2, proba=0.1), "mostly random"),
        (text_like(100000, 3), "text"),
        (bytes(100000), "zeros"),
        (gen(300000, 4, proba=0.7), "multi-block"),
    ]


@pytest.mark.parametrize("level", LEVELS)
def test_native_compress_py_decode(level):
    for data, name in _corpora():
        c = runtime.compress(data, level)
        assert py_decompress(c, len(data)) == data, f"{name} level {level}"


@pytest.mark.parametrize("level", LEVELS)
def test_native_compress_native_decode(level):
    for data, name in _corpora():
        c = runtime.compress(data, level)
        assert runtime.decompress(c, len(data)) == data, \
            f"{name} level {level}"


@pytest.mark.parametrize("level", (11, 21, 35, 41, 49))
def test_native_compress_liblizard_decode(level):
    """Interop: the reference decoder must accept native-encoder streams."""
    oracle = pytest.importorskip("tests.oracle")
    lib = oracle._load()
    if lib is None:
        pytest.skip("reference liblizard not built")
    o = oracle.Oracle(lib)
    for data, name in _corpora():
        if not data:
            continue  # Lizard_decompress_safe rejects zero-size input
        c = runtime.compress(data, level)
        assert o.decompress(c, len(data)) == data, f"{name} level {level}"


def test_native_ratio_sane():
    """The entropy stage must actually engage at levels >= 30."""
    data = text_like(400000, 7)
    c21 = runtime.compress(data, 21)
    c41 = runtime.compress(data, 41)
    assert len(c41) < len(c21) * 0.95, (len(c21), len(c41))


def test_native_huf_roundtrip():
    from lizard_tpu.ref.huf import huf_decompress as py_huf
    for seed in range(5):
        s = text_like(60000, seed)
        c = runtime.huf_compress(s)
        assert c is not None and len(c) < len(s)
        assert runtime.huf_decompress(c, len(s)) == s
        assert py_huf(c, len(s)) == s


def test_native_huf_incompressible():
    import random
    rnd = random.Random(1)
    s = bytes(rnd.randrange(256) for _ in range(4096))
    assert runtime.huf_compress(s) is None


def test_native_huf_rle():
    c = runtime.huf_compress(b"z" * 5000)
    assert c == b"z"
    assert runtime.huf_decompress(c, 5000) == b"z" * 5000
