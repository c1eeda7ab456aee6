"""Lane-parallel Pallas decoder vs the bit-exact oracle (CPU interpret mode,
shrunken geometry: blocks <= 2 KB, 5-tile ring)."""

import os

import numpy as np
import pytest

from lizard_tpu.ref.block_encode import compress
from lizard_tpu.utils.datagen import gen

SPB = 4          # output tiles per block -> 2 KB blocks
RTILES = 7       # 3584 B ring (> 2048 max offset + 1024 band)
GROUPS = 1       # 8 slots


def roundtrip(datas, level=10):
    from lizard_tpu.ops.lane_decode import decompress_lanes
    streams = [compress(d, level) for d in datas]
    outs = decompress_lanes(streams, interpret=True, spb=SPB, rtiles=RTILES,
                            groups=GROUPS)
    for i, (want, got) in enumerate(zip(datas, outs)):
        assert got == want, (
            f"stream {i} (len {len(want)}): first diff at "
            f"{next((k for k in range(min(len(got), len(want))) if got[k] != want[k]), 'len')} "
            f"got_len={len(got)}")


def test_compressible_basic():
    roundtrip([gen(1800, seed=1, proba=0.7)])


def test_multiple_levels():
    d = gen(1900, seed=2, proba=0.6)
    for level in (10, 11, 12, 14, 17):
        roundtrip([d], level=level)


def test_overlap_matches():
    roundtrip([b"\x00" * 2000])            # off=1 RLE
    roundtrip([b"ab" * 1000])              # off=2
    roundtrip([b"abc" * 650])              # off=3
    roundtrip([bytes(range(7)) * 290])     # off=7


def test_incompressible_tail():
    rng = np.random.default_rng(3)
    roundtrip([rng.integers(0, 256, 1500, dtype=np.uint8).tobytes()])


def test_long_literal_run_defer():
    # >512 B literal run forces the deferred match fetch
    rng = np.random.default_rng(4)
    head = rng.integers(0, 256, 900, dtype=np.uint8).tobytes()
    roundtrip([head + head[:900]])


def test_many_streams_chained_slots():
    rng = np.random.default_rng(5)
    datas = []
    for i in range(20):
        n = int(rng.integers(1, 2049))
        if i % 3 == 0:
            datas.append(gen(n, seed=i, proba=0.8))
        elif i % 3 == 1:
            datas.append(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        else:
            datas.append((b"xyzw" * ((n + 3) // 4))[:n])
    roundtrip(datas)


def test_tiny_streams():
    roundtrip([b"a", b"hello world!", b"\x00" * 17])


def test_far_offsets_cross_band():
    # matches reaching back near the ring limit (~2 KB)
    base = gen(1024, seed=7, proba=0.5)
    data = base + b"QQ" + base[:1000]      # off ~1026 matches
    roundtrip([data])


def test_interleaved_groups():
    from lizard_tpu.ops.lane_decode import decompress_lanes
    from lizard_tpu.ref.block_encode import compress
    datas = [gen(1500 + 37 * i, seed=40 + i, proba=0.7) for i in range(10)]
    streams = [compress(d, 10) for d in datas]
    outs = decompress_lanes(streams, interpret=True, spb=SPB, rtiles=RTILES,
                            groups=2, il=2)
    for want, got in zip(datas, outs):
        assert got == want


def liz_roundtrip(datas, level=21, groups=GROUPS, il=1):
    from lizard_tpu.ops.lane_decode import decompress_lanes
    from lizard_tpu.ref.block_encode import compress
    streams = [compress(d, level) for d in datas]
    outs = decompress_lanes(streams, interpret=True, spb=SPB, rtiles=RTILES,
                            groups=groups, il=il)
    for i, (want, got) in enumerate(zip(datas, outs)):
        assert got == want, (
            f"stream {i} len {len(want)}: first diff at "
            f"{next((k for k in range(min(len(got), len(want))) if got[k] != want[k]), 'len')}")


def test_liz_basic():
    liz_roundtrip([gen(1800, seed=11, proba=0.7)])


def test_liz_levels():
    d = gen(1900, seed=12, proba=0.6)
    for level in (20, 21, 22, 23, 25, 29):
        liz_roundtrip([d], level=level)


def test_liz_rep_offsets():
    # structured data with repeated strides exercises rep-offset tokens
    rec = bytes(range(48))
    data = b"".join(rec[:i % 7 + 40] for i in range(40))[:2000]
    liz_roundtrip([data])
    liz_roundtrip([b"\x00" * 2000])
    liz_roundtrip([b"abcabcab" * 250])


def test_liz_incompressible_and_defer():
    rng = np.random.default_rng(13)
    liz_roundtrip([rng.integers(0, 256, 1400, dtype=np.uint8).tobytes()])
    head = rng.integers(0, 256, 900, dtype=np.uint8).tobytes()
    liz_roundtrip([head + head[:900]])


def test_liz_many_streams():
    rng = np.random.default_rng(14)
    datas = [gen(int(rng.integers(1, 2049)), seed=50 + i, proba=0.75)
             for i in range(12)]
    liz_roundtrip(datas)


def test_frame_lane_path():
    from lizard_tpu.frame import compress_frame, decompress_frame_lanes
    datas = b"".join(gen(1500 + 31 * i, seed=70 + i, proba=0.7)
                     for i in range(6))
    # blockSizeID 1 -> 128 KB blocks, but our test geometry wants small
    # blocks: craft a frame with several <=2 KB blocks by using tiny input
    # per frame; instead decode a multi-block frame built from 2 KB chunks
    # via the block-independent encoder at bsid 1 with small content
    frame = compress_frame(datas[:1800], 10, block_size_id=1)
    got = decompress_frame_lanes(frame, interpret=True, spb=SPB,
                                 rtiles=RTILES, groups=GROUPS)
    assert got == datas[:1800]


@pytest.mark.parametrize("family_level", [10, 11, 14, 21, 24])
def test_lane_fuzz_sweep(family_level):
    """Seeded randomized sweep: mixed content classes, sizes crossing band
    and super boundaries, both codeword families."""
    rng = np.random.default_rng(family_level * 977)
    datas = []
    for i in range(8):
        kind = i % 4
        n = int(rng.integers(1, 2049))
        if i == 3:
            n = 2048                       # exactly full test block
        if i == 5:
            n = 512                        # exactly one super
        if kind == 0:
            datas.append(gen(n, seed=int(rng.integers(1 << 30)), proba=0.85))
        elif kind == 1:
            datas.append(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        elif kind == 2:
            pat = bytes(rng.integers(0, 256, int(rng.integers(1, 40)),
                                     dtype=np.uint8))
            datas.append((pat * (n // len(pat) + 1))[:n])
        else:
            head = rng.integers(0, 256, n // 2 + 1, dtype=np.uint8).tobytes()
            datas.append((head + head)[:n])
    roundtrip(datas, level=family_level)


def test_liz_chained_stream_rejected():
    """LIZv1 streams spanning multiple inner blocks exceed the lane ring's
    reach and must be rejected (fallback paths handle them)."""
    from lizard_tpu.ops.lane_decode import decode_batch_lanes
    from lizard_tpu.ops.split import split_streams
    from lizard_tpu.ref.block_encode import compress
    data = gen(140_000, seed=99, proba=0.7)  # > 128 KB -> 2 inner blocks
    batch = split_streams([compress(data, 21)])
    assert batch.n_blocks == 2
    with pytest.raises(ValueError):
        decode_batch_lanes(batch, interpret=True, spb=SPB, rtiles=RTILES,
                           groups=GROUPS)
