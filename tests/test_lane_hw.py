"""Production-geometry lane-kernel parity sweep on REAL TPU hardware.

The interpret-mode suite (test_lane_decode.py) runs shrunken geometry
(2 KB blocks, 5-tile rings); this file exercises the PRODUCTION kernel --
128 KB blocks, 129/257-tile rings, il interleave -- across one stream set
per level family and compares against the bit-exact oracle.

Run with:  RUN_TPU_TESTS=1 python -m pytest tests/test_lane_hw.py -v
Skipped automatically when no TPU is attached (CI/CPU runs).
"""

import os

import pytest

RUN = os.environ.get("RUN_TPU_TESTS") == "1"

pytestmark = pytest.mark.tpu


def _have_tpu():
    if not RUN:
        return False
    import jax
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@pytest.mark.skipif(not _have_tpu(), reason="needs RUN_TPU_TESTS=1 + TPU")
@pytest.mark.parametrize("level", (10, 21, 35, 49))
def test_production_geometry_parity(level):
    """160 blocks x 128 KB (20 MB) per family at production geometry."""
    from bench import build_corpus, compress_blocks
    from lizard_tpu.ops.lane_decode import decompress_lanes

    data = build_corpus(160 * 131072)
    streams = compress_blocks(data, level)
    outs = decompress_lanes(streams)
    got = b"".join(outs)
    assert got == data, (
        f"level {level}: first diff at "
        f"{next((k for k in range(min(len(got), len(data))) if got[k] != data[k]), 'len')}")


@pytest.mark.skipif(not _have_tpu(), reason="needs RUN_TPU_TESTS=1 + TPU")
def test_production_geometry_ragged():
    """Uneven stream count/sizes (not a multiple of 128 slots; partial
    final blocks) at production geometry."""
    from lizard_tpu.ops.lane_decode import decompress_lanes
    from lizard_tpu.ref.block_encode import compress
    from lizard_tpu.utils.datagen import gen

    datas = [gen(n, seed=n, proba=0.6)
             for n in (131072, 131072, 70_000, 131072 * 2 + 999, 1, 500)]
    streams = [compress(d, 10) for d in datas]
    outs = decompress_lanes(streams)
    for want, got in zip(datas, outs):
        assert got == want


@pytest.mark.skipif(not _have_tpu(), reason="needs RUN_TPU_TESTS=1 + TPU")
@pytest.mark.parametrize("level", (21, 29, 45))
def test_production_liz_big_window_far_matches(level):
    """LIZv1 chained multi-block streams (1 MB windows: matches reach up to
    1 MB back, far beyond the 132 KB in-VMEM ring) decode via the HBM
    far-window path at production geometry."""
    import numpy as np
    from lizard_tpu.ops.lane_decode import decompress_lanes
    from lizard_tpu.ref.block_encode import compress
    from lizard_tpu.utils.datagen import gen

    rng = np.random.default_rng(level)
    a = rng.integers(0, 256, 60_000, dtype=np.uint8).tobytes()
    datas = []
    for k in range(4):
        mid = gen(800_000 + 7919 * k, seed=level * 10 + k, proba=0.55)
        datas.append(a + mid + a)     # far copy ~860 KB back
    streams = [compress(d, level) for d in datas]
    outs = decompress_lanes(streams)
    for want, got in zip(datas, outs):
        assert got == want


@pytest.mark.skipif(not _have_tpu(), reason="needs RUN_TPU_TESTS=1 + TPU")
@pytest.mark.parametrize("level", (10, 11, 21, 14, 17, 19, 24))
def test_encoder_production_parity(level):
    """Pass A on the real chip at production geometry (128 KB blocks,
    64 KB reach for 11+; 17/19 = hash-chain prewalk tiers) must emit
    exactly the mirror's token lists and the streams must round-trip."""
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    from bench import build_corpus
    from lizard_tpu.ops.enc_lanes import (cfg_for_level, p1_call,
                                          p15_call, p15_reference,
                                          pA_call,
                                          pack_blocks, unpack_tokens,
                                          p2_reference, p1_reference,
                                          unpack_d16,
                                          encode_blocks_lanes)
    from lizard_tpu.ref.block_decode import decompress

    cfg = cfg_for_level(level)
    data = build_corpus(8 * cfg.n)
    blocks = [data[i:i + cfg.n] for i in range(0, len(data), cfg.n)][:8]
    w32i, meta = pack_blocks(blocks, cfg)
    pk = p1_call(jnp.asarray(w32i), jnp.asarray(meta), cfg)
    ref_d, _ = p1_reference(blocks, cfg)
    for m in range(cfg.nmaps):
        got_d = unpack_d16(pk, cfg, m=m)
        want_d = ref_d if cfg.nmaps == 1 else ref_d[:, m]
        assert np.array_equal(got_d, want_d), f"p1 hw != mirror, map {m}"
    pa_cfg = cfg
    if cfg.chain:
        pk = p15_call(jnp.asarray(w32i), pk, jnp.asarray(meta), cfg)
        pa_cfg = dataclasses.replace(cfg, chain=0)
        wref = p15_reference(blocks, cfg, dmap=ref_d)
        for m in range(pa_cfg.nmaps):
            got_d = unpack_d16(pk, pa_cfg, m=m)
            want_d = wref if pa_cfg.nmaps == 1 else wref[:, m]
            assert np.array_equal(got_d, want_d), f"p15 hw map {m}"
    tok = pA_call(jnp.asarray(w32i), pk, jnp.asarray(meta), pa_cfg)
    got = unpack_tokens(tok, pa_cfg)
    want = p2_reference(blocks, cfg, dmap=ref_d)
    for b in range(8):
        assert got[b] == want[b], f"passA hardware != mirror, block {b}"
    encs = encode_blocks_lanes(blocks, level=level, cfg=cfg,
                               interpret=False)
    for d, e in zip(blocks, encs):
        assert bytes(decompress(e, max_out=len(d))) == d


@pytest.mark.skipif(not _have_tpu(), reason="needs RUN_TPU_TESTS=1 + TPU")
def test_huf128_hardware():
    """Cell-chained Huff0 kernel (ops/huf128.py) parity on the real chip:
    a mixed blob set spanning single-row and multi-row streams, skewed
    weights, odd sizes, an RLE blob, and enough streams that cells form
    chains (adaptive groups oversubscribe cells ~3-4x)."""
    from lizard_tpu.ref.huf_encode import huf_compress
    from lizard_tpu.ops.huf128 import huf_decompress_128
    from lizard_tpu.utils.datagen import gen, text_like

    datas = []
    for n in (515, 1000, 2049, 3000, 4096, 9000, 12000, 700):
        datas.append(text_like(n, n))
    for s in range(40):                      # force chains on few cells
        datas.append(gen(2500 + 97 * s, 50 + s, proba=0.8))
    datas.append(b"a" * 4000 + b"b" * 300 + b"c" * 40 + bytes(range(64)))
    blobs = []
    keep = []
    for d in datas:
        c = huf_compress(d)
        if c is None or len(c) <= 1:
            continue
        blobs.append((c, len(d)))
        keep.append(d)
    blobs.append((b"z", 77))                 # RLE host path
    keep.append(b"z" * 77)
    outs = huf_decompress_128(blobs)
    assert len(outs) == len(keep)
    for i, (got, want) in enumerate(zip(outs, keep)):
        assert got == want, f"blob {i} mismatch ({len(got)}/{len(want)})"


@pytest.mark.skipif(not _have_tpu(), reason="needs RUN_TPU_TESTS=1 + TPU")
def test_sharded_dp1_matches_direct():
    """The production lane kernel under shard_map on a 1-device mesh
    must produce the direct call's exact output (the dp step the bench's
    decode_sharded_dp1 row times; the 8-way CPU-mesh variant runs in
    dryrun_multichip)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from bench import build_corpus, compress_blocks
    from lizard_tpu.ops.lane_decode import decompress_lanes
    from lizard_tpu.parallel.pipeline import decode_streams_sharded_lanes

    data = build_corpus(4 << 20)
    streams = compress_blocks(data, 10)
    mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))
    got = decode_streams_sharded_lanes(streams, mesh, il=4)
    want = decompress_lanes(streams, il=4, entropy="host")
    assert got == want
    assert b"".join(got) == data


@pytest.mark.skipif(not _have_tpu(), reason="needs RUN_TPU_TESTS=1 + TPU")
def test_far_off24_production_ratio():
    """Level-21 lane encode with the off24 far table on data whose
    redundancy sits at 64-128 KB distances: streams must round-trip, use
    the off24 class, and clearly beat the near-only configuration."""
    import dataclasses
    import numpy as np
    from lizard_tpu.ops.enc_lanes import cfg_for_level, encode_blocks_lanes
    from lizard_tpu.ref.block_decode import decompress

    rng = np.random.default_rng(99)
    head = rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
    block = head + head[:31_000]           # repeat at distance 100 000
    cfg = cfg_for_level(21)
    assert cfg.far == 1
    comp = encode_blocks_lanes([block], level=21, cfg=cfg)[0]
    assert bytes(decompress(comp, max_out=len(block))) == block
    near = encode_blocks_lanes(
        [block], level=21,
        cfg=dataclasses.replace(cfg, far=0))[0]
    assert len(comp) < len(near) - 10_000, (len(comp), len(near))
