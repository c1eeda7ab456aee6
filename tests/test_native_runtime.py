"""Native C++ runtime vs Python oracle and reference."""

import time

import pytest

from lizard_tpu import runtime
from lizard_tpu.frame import compress_frame
from lizard_tpu.ref.block_encode import compress
from lizard_tpu.utils.datagen import gen, text_like
from lizard_tpu.utils.xxh import xxh32 as py_xxh32, xxh64 as py_xxh64


pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native runtime not built")


def test_native_xxh():
    for n in (0, 1, 15, 16, 17, 1000, 100_000):
        data = gen(n, seed=n) if n else b""
        assert runtime.xxh32(data, 0) == py_xxh32(data, 0)
        assert runtime.xxh64(data, 7) == py_xxh64(data, 7)


@pytest.mark.parametrize("level", [10, 14, 17, 21, 25, 29, 31, 35, 41, 45, 49])
def test_native_block_decode(level):
    for data in (gen(60_000, 3), text_like(40_000, 4), bytes(3000), b"x"):
        comp = compress(data, level)
        assert runtime.decompress(comp, len(data)) == data


@pytest.mark.parametrize("linked", [False, True])
def test_native_frame_decode(linked):
    data = gen(400_000, 5)
    f = compress_frame(data, 16, block_linked=linked)
    assert runtime.decompress_frame(f, len(data) + 16) == data


def test_native_rejects_bad_checksum():
    data = gen(10_000, 1)
    f = bytearray(compress_frame(data, 12))
    f[-1] ^= 0xFF
    with pytest.raises(ValueError):
        runtime.decompress_frame(bytes(f), len(data) + 16)


def test_native_decode_speed():
    data = gen(4 << 20, 9)
    comp = compress_frame(data, 11)
    t0 = time.perf_counter()
    out = runtime.decompress_frame(comp, len(data) + 16)
    dt = time.perf_counter() - t0
    assert out == data
    assert dt < 1.0, f"native decode too slow: {dt}s"


def test_native_encoder_roundtrip():
    """The fast native encoder's output decodes bit-exactly on every
    decoder: our oracle, the native decoder, and (when built) liblizard."""
    import numpy as np
    import pytest
    from lizard_tpu import runtime
    if not runtime.available():
        pytest.skip("native runtime not built")
    from lizard_tpu.ref.block_decode import decompress
    from lizard_tpu.utils.datagen import gen
    rng = np.random.default_rng(7)
    cases = [gen(200000, seed=1, proba=0.7), b"", b"q", b"\x00" * 100000,
             rng.integers(0, 256, 50000, dtype=np.uint8).tobytes(),
             gen(300000, seed=2, proba=0.9)]
    for data in cases:
        comp = runtime.compress(data, 11)
        assert decompress(comp, max_out=max(len(data), 16)) == data
        got = runtime.decompress(comp, max_out=max(len(data), 16))
        assert got == data
    try:
        from tests.oracle import _load, Oracle
        lib = _load()
    except Exception:
        lib = None
    if lib is not None:
        o = Oracle(lib)
        for data in cases:
            if not data:
                continue
            assert o.decompress(runtime.compress(data, 11), len(data)) == data


def test_native_emit_parity():
    """ltpu_emit_lz4/_liz must emit byte-identical streams to the numpy
    emitters for real parses and edge cases."""
    import numpy as np
    import pytest
    from lizard_tpu import runtime
    from lizard_tpu.ops.enc_lanes import (cfg_for_level, emit_tokens,
                                          emit_tokens_liz, p2_reference)
    from lizard_tpu.utils.datagen import gen, text_like
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    cfg = cfg_for_level(11)
    for d in (text_like(131072, 7), gen(131072, 8, proba=0.6),
              gen(50000, 9, proba=0.3), b"x" * 4096, b""):
        toks = p2_reference([d], cfg)[0]
        st = np.array([t[0] for t in toks], np.int64)
        ml = np.array([t[1] for t in toks], np.int64)
        off = np.array([t[2] for t in toks], np.int64)
        f2, l2 = emit_tokens(d, st, ml, off)
        got = runtime.emit_lz4(d, st, ml, off)
        assert got == (f2.tobytes(), l2.tobytes())
        f3, l3, o3, o24 = emit_tokens_liz(d, st, ml, off)
        assert len(o24) == 0            # level-11 parse: near-only
        got = runtime.emit_liz(d, st, ml, off)
        assert got == (f3.tobytes(), l3.tobytes(), o3.tobytes())


def test_native_emit_liz_far_parity():
    """ltpu_emit_liz_far vs the scalar python emitter on token lists
    containing off24-class offsets, and decodability of the assembled
    block by the oracle decoder."""
    import numpy as np
    import pytest
    from lizard_tpu import runtime
    from lizard_tpu.ops.enc_lanes import (_emit_tokens_liz_scalar,
                                          assemble_block)
    from lizard_tpu.ref.block_decode import decompress
    from lizard_tpu.utils.datagen import gen
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(11)
    head = rng.integers(0, 256, 70_000, dtype=np.uint8).tobytes()
    st = np.array([70_064, 70_128], np.int64)
    ml = np.array([40, 40], np.int64)

    # far match (70064 back, ml 40) then a near match (off 64)
    d1 = head + b"A" * 64 + head[:40] + b"B" * 24 + head[:40]
    off1 = np.array([70_064, 64], np.int64)
    fp, lp, o16p, o24p = _emit_tokens_liz_scalar(d1, st, ml, off1)
    got = runtime.emit_liz_far(d1, st, ml, off1)
    assert got == (fp.tobytes(), lp.tobytes(), o16p.tobytes(),
                   o24p.tobytes())
    assert len(o24p) == 3               # exactly one off24 offset
    blk = assemble_block(d1, fp, lp, o16p, huff=False, off24=o24p)
    assert decompress(bytes([21]) + blk, max_out=len(d1)) == d1

    # rep collapsing of an off24 offset (second token reuses 70064)
    d2 = head + b"A" * 64 + head[:40] + b"B" * 24 + head[64:104]
    off2 = np.array([70_064, 70_064], np.int64)
    f2, l2, a16, a24 = _emit_tokens_liz_scalar(d2, st, ml, off2)
    got2 = runtime.emit_liz_far(d2, st, ml, off2)
    assert got2 == (f2.tobytes(), l2.tobytes(), a16.tobytes(),
                    a24.tobytes())
    assert len(a24) == 3                # the rep emits no second offset
    blk2 = assemble_block(d2, f2, l2, a16, huff=False, off24=a24)
    assert decompress(bytes([21]) + blk2, max_out=len(d2)) == d2
