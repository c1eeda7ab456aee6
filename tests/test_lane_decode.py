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


def _chained_batch(datas, level, block_size):
    """Compress with shrunken inner blocks so multi-block chains fit the
    test geometry (production inner blocks are 128 KB)."""
    import lizard_tpu.ref.block_encode as be
    from lizard_tpu.ops.split import split_streams
    old = be.LIZARD_BLOCK_SIZE
    be.LIZARD_BLOCK_SIZE = block_size
    try:
        streams = [be.compress(d, level) for d in datas]
    finally:
        be.LIZARD_BLOCK_SIZE = old
    return split_streams(streams), streams


def _decode_batch(batch):
    from lizard_tpu.ops.lane_decode import decode_batch_lanes
    return decode_batch_lanes(batch, interpret=True, spb=SPB,
                              rtiles=RTILES, groups=GROUPS)


def test_liz_chained_far_matches():
    """LIZv1 chains whose matches reach beyond the ring (RING_REACH =
    (rtiles-1)*512 = 3072 here) decode via the HBM-staged far window."""
    rng = np.random.default_rng(21)
    a = rng.integers(0, 256, 1200, dtype=np.uint8).tobytes()
    mid = rng.integers(0, 256, 3500, dtype=np.uint8).tobytes()
    data = a + mid + a          # final copy of `a` reaches ~4700 back
    batch, _ = _chained_batch([data], 29, 2048)
    assert batch.n_blocks >= 3
    got = b"".join(_decode_batch(batch))
    assert got == data


def test_liz_chained_mixed_near_far():
    """Mix of in-ring and far matches, several chains at once, plus a
    straddling match (part of the copy is within ring reach)."""
    rng = np.random.default_rng(22)
    a = rng.integers(0, 256, 900, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, 700, dtype=np.uint8).tobytes()
    d1 = a + b + rng.integers(0, 256, 2200, dtype=np.uint8).tobytes() + b + a
    d2 = (b * 3) + rng.integers(0, 256, 3300, dtype=np.uint8).tobytes() + b
    d3 = gen(2000, seed=23, proba=0.8)       # no far matches at all
    batch, _ = _chained_batch([d1, d2, d3], 25, 2048)
    outs = _decode_batch(batch)
    got = b"".join(outs)
    assert got == d1 + d2 + d3


def test_liz_far_overflow_host_fallback(monkeypatch):
    """A band referencing more far source tiles than NFENT flags its block;
    the whole chain must be re-decoded bit-exact on the host."""
    import lizard_tpu.ops.lane_decode as ld
    rng = np.random.default_rng(24)
    # 32 snippets spaced 512 B apart -> 32 distinct source tiles; their
    # back-to-back 32 B copies span two bands, so each band of the copy
    # region references 16 > NFENT(=8) far tiles (verified: the encoder
    # emits 32 off16 match tokens in the final block)
    src = bytearray(rng.integers(0, 256, 32 * 512, dtype=np.uint8).tobytes())
    snippets = [bytes(src[k * 512:k * 512 + 32]) for k in range(32)]
    data = bytes(src) + b"".join(snippets)
    calls = []
    orig = ld._host_decode_chain

    def spy(batch, idxs):
        calls.append(list(idxs))
        return orig(batch, idxs)

    monkeypatch.setattr(ld, "_host_decode_chain", spy)
    batch, _ = _chained_batch([data], 29, 2048)
    outs = _decode_batch(batch)
    assert b"".join(outs) == data
    assert calls, "expected the far-overflow host fallback to trigger"


def test_liz_chained_no_far_stays_on_kernel(monkeypatch):
    """Chained streams without far matches must NOT fall back."""
    import lizard_tpu.ops.lane_decode as ld
    monkeypatch.setattr(ld, "_host_decode_chain",
                        lambda *a: pytest.fail("unexpected host fallback"))
    # repeats only at short range: random 300 B patterns, each doubled
    rng = np.random.default_rng(26)
    parts = []
    for _ in range(10):
        pat = rng.integers(0, 256, 300, dtype=np.uint8).tobytes()
        parts.append(pat + pat)
    data = b"".join(parts)
    batch, _ = _chained_batch([data], 22, 2048)
    outs = _decode_batch(batch)
    assert b"".join(outs) == data


def test_fused_entropy_pipeline():
    """decompress_lanes_fused: huf128 -> translate -> compact-into-pool
    -> lane decode with no host entropy staging, vs the oracle, on
    Huffman-level streams (both families). Shrunken lane geometry;
    the huf/compact kernels run production logic."""
    from lizard_tpu.ops.fuse import decompress_lanes_fused
    from lizard_tpu.utils.datagen import text_like

    for level in (35, 41):
        datas = [text_like(1900, seed=level * 10 + i) for i in range(5)]
        datas.append(gen(1500, seed=level, proba=0.85))
        streams = [compress(d, level) for d in datas]
        got = decompress_lanes_fused(streams, interpret=True, spb=SPB,
                                     rtiles=RTILES, groups=GROUPS, il=1)
        for i, (g, w) in enumerate(zip(got, datas)):
            assert g == w, (
                f"L{level} stream {i}: first diff at "
                f"{next((k for k in range(min(len(g), len(w))) if g[k] != w[k]), 'len')} "
                f"({len(g)}/{len(w)})")


def test_fused_pipeline_raw_mix():
    """Streams whose blocks mix huffman and raw/stored forms + an
    incompressible stream (no huf at all) through the fused path."""
    import numpy as np
    from lizard_tpu.ops.fuse import decompress_lanes_fused
    from lizard_tpu.utils.datagen import text_like

    rng = np.random.default_rng(8)
    datas = [text_like(2000, seed=1),
             rng.integers(0, 256, 1800, dtype=np.uint8).tobytes(),
             b"\x11" * 1700]
    streams = [compress(d, 31) for d in datas]
    got = decompress_lanes_fused(streams, interpret=True, spb=SPB,
                                 rtiles=RTILES, groups=GROUPS, il=1)
    assert got == datas
