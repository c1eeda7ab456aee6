"""Frame-format tests: parity vs reference (fresh-process oracle — the
reference's frame API output depends on heap history otherwise), round-trip,
incremental decode, skippable frames, concatenation, corruption."""

import base64
import subprocess
import sys

import pytest

from lizard_tpu.frame import (
    FrameDecoder,
    FrameError,
    compress_frame,
    decompress_frame,
    decompress_frames,
    parse_frame_header,
)
from lizard_tpu.utils.datagen import gen, text_like
from tests.oracle import require_oracle


def _ref_frame_fresh(data, level, bsid=0, linked=False, checksum=True):
    code = f'''
import sys
sys.path.insert(0, "/root/repo")
from tests.oracle import _load, Oracle
o = Oracle(_load())
data = sys.stdin.buffer.read()
sys.stdout.buffer.write(o.compress_frame(data, {level}, block_size_id={bsid},
                                          block_linked={linked}, checksum={checksum}))
'''
    r = subprocess.run([sys.executable, "-c", code], input=data, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()
    return r.stdout


@pytest.mark.parametrize("level", [10, 21, 41])
def test_frame_identical_multiblock(level):
    require_oracle()
    data = gen(300_000, 3)
    assert compress_frame(data, level) == _ref_frame_fresh(data, level)


def test_frame_identical_linked():
    require_oracle()
    data = gen(600_000, 5)
    assert (compress_frame(data, 21, block_linked=True)
            == _ref_frame_fresh(data, 21, linked=True))


@pytest.mark.slow
@pytest.mark.parametrize("level", [10, 17, 21, 26, 31, 41, 46])
@pytest.mark.parametrize("kw", [dict(), dict(checksum=False), dict(bsid=4),
                                dict(linked=True)])
def test_frame_identical_sweep(level, kw):
    require_oracle()
    data = gen(300_000, 3)
    mine = compress_frame(data, level,
                          block_size_id=kw.get("bsid", 0),
                          block_linked=kw.get("linked", False),
                          content_checksum=kw.get("checksum", True))
    assert mine == _ref_frame_fresh(data, level, **kw)


def test_frame_roundtrip():
    for data in [b"", b"x", gen(5000, 1), gen(300_000, 2)]:
        for linked in (False, True):
            f = compress_frame(data, 14, block_linked=linked)
            assert decompress_frame(f) == data


def test_frame_reference_decodes_ours():
    o = require_oracle()
    import ctypes
    lib = o.lib
    lib.LizardF_createDecompressionContext.restype = ctypes.c_size_t
    data = gen(200_000, 7)
    f = compress_frame(data, 17)
    # decode via reference frame API
    dctx = ctypes.c_void_p()
    assert lib.LizardF_createDecompressionContext(ctypes.byref(dctx), 100) == 0
    dst = ctypes.create_string_buffer(len(data) + 16)
    src_sz = ctypes.c_size_t(len(f))
    dst_sz = ctypes.c_size_t(len(dst))
    res = lib.LizardF_decompress(dctx, dst, ctypes.byref(dst_sz), f,
                                 ctypes.byref(src_sz), None)
    assert not lib.LizardF_isError(res)
    assert dst.raw[:dst_sz.value] == data
    lib.LizardF_freeDecompressionContext(dctx)


def test_frame_byte_at_a_time_decode():
    data = gen(100_000, 9)
    f = compress_frame(data, 12)
    dec = FrameDecoder()
    out = b""
    for i in range(len(f)):
        out += dec.update(f[i:i + 1])
    assert out == data
    assert dec.finished


def test_frame_concatenation_and_skippable():
    a = gen(10_000, 1)
    b = gen(20_000, 2)
    skippable = (0x184D2A50).to_bytes(4, "little") + (5).to_bytes(4, "little") + b"hello"
    stream = compress_frame(a, 11) + skippable + compress_frame(b, 21)
    assert decompress_frames(stream) == a + b
    dec = FrameDecoder()
    out = b""
    for i in range(0, len(stream), 13):
        out += dec.update(stream[i:i + 13])
    assert out == a + b


def test_frame_rejects_corruption():
    data = gen(50_000, 4)
    f = bytearray(compress_frame(data, 14))
    with pytest.raises(FrameError):
        parse_frame_header(b"\x00" * 16)
    bad = f.copy()
    bad[5] ^= 0x10  # descriptor bit => header checksum mismatch
    with pytest.raises(FrameError):
        decompress_frame(bytes(bad))
    bad = f.copy()
    bad[-1] ^= 0xFF  # content checksum
    with pytest.raises(FrameError):
        decompress_frame(bytes(bad))
    bad = f.copy()
    bad[30] ^= 0xFF  # block payload
    with pytest.raises(FrameError):
        decompress_frame(bytes(bad))


def test_frame_content_size_flag():
    data = gen(30_000, 6)
    f = compress_frame(data, 15, content_size=True)
    info = parse_frame_header(f[:20])
    assert info.content_size == len(data)
    assert decompress_frame(f) == data


def test_compress_frame_fast_roundtrip():
    """compress_frame_fast (native encoder) produces frames every decoder
    accepts."""
    from lizard_tpu.frame import compress_frame_fast, decompress_frame
    from lizard_tpu.utils.datagen import gen
    import numpy as np
    rng = np.random.default_rng(9)
    for data in (gen(300000, seed=3, proba=0.7), b"", b"z" * 5,
                 rng.integers(0, 256, 150000, dtype=np.uint8).tobytes()):
        frame = compress_frame_fast(data, 11)
        assert decompress_frame(frame) == data
