"""Pallas lane encoder tests (interpret mode, CPU).

Phase 1 (match finding) is checked bit-exactly against the numpy mirror
p1_reference on a shrunken geometry (8 KB blocks, 2^10 table)."""

import numpy as np
import pytest

from lizard_tpu.ops.enc_lanes import EncCfg, p1_call, p1_reference, \
    pack_blocks

CFG = EncCfg(n=8192, hl=10, maxoff=2047,
             probes=(8, 12, 16, 24, 32, 64, 128, 256))


def _mk_blocks(seed=0):
    from lizard_tpu.utils.datagen import gen, text_like
    rng = np.random.default_rng(seed)
    blocks = [
        gen(CFG.n, seed, proba=0.7),
        text_like(CFG.n, seed + 1),
        gen(CFG.n // 2 + 13, seed + 2, proba=0.4),
        bytes(rng.integers(0, 256, CFG.n, dtype=np.uint8)),  # incompressible
        b"\x55" * (CFG.n // 3),                              # RLE
        bytes(np.tile(np.frombuffer(b"abcdefg", np.uint8), 700)),  # period 7
        gen(200, seed + 3, proba=0.6),
        b"",
    ]
    return blocks


@pytest.mark.parametrize("seed", [0, 7])
def test_p1_matches_reference(seed):
    blocks = _mk_blocks(seed)
    w32i, meta = pack_blocks(blocks, CFG)
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import unpack_d16
    packed = p1_call(jnp.asarray(w32i), jnp.asarray(meta),
                     CFG, interpret=True)
    ref, _ = p1_reference(blocks, CFG)
    got = unpack_d16(packed, CFG)
    for b in range(8):
        neq = np.nonzero(got[b] != ref[b])[0]
        assert neq.size == 0, (
            f"block {b}: {neq.size} mismatches, first at {neq[:5]}: "
            f"got {got[b][neq[:5]]} want {ref[b][neq[:5]]}")


def test_p1_candidates_are_real_matches():
    """Every reported candidate must 4-byte-match its position."""
    blocks = _mk_blocks(3)
    w32i, meta = pack_blocks(blocks, CFG)
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import unpack_d16
    packed = p1_call(jnp.asarray(w32i), jnp.asarray(meta),
                     CFG, interpret=True)
    got = unpack_d16(packed, CFG)
    for b, d in enumerate(blocks):
        u8 = np.zeros(CFG.n + 4, np.uint8)
        u8[:len(d)] = np.frombuffer(d, np.uint8)
        dm = got[b]
        idx = np.nonzero(dm > 0)[0]
        if not idx.size:
            continue
        off = dm[idx]
        assert off.min() >= CFG.min_offset
        assert off.max() <= CFG.maxoff
        for r in range(4):
            assert np.array_equal(u8[idx + r], u8[idx - off + r])


def test_passA_matches_reference():
    """Pass-A kernel (interpret) must emit exactly the mirror's greedy
    token list for every block."""
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import pA_call, p2_reference, \
        unpack_tokens
    blocks = _mk_blocks(11)
    w32i, meta = pack_blocks(blocks, CFG)
    packed = p1_call(jnp.asarray(w32i), jnp.asarray(meta), CFG,
                     interpret=True)
    tok = pA_call(jnp.asarray(w32i), packed, jnp.asarray(meta), CFG,
                  interpret=True)
    got = unpack_tokens(tok, CFG)
    want = p2_reference(blocks, CFG)
    for b in range(8):
        assert got[b] == want[b], (
            f"block {b}: {len(got[b])} vs {len(want[b])} tokens; first "
            f"diff: {next(((i, x, y) for i, (x, y) in enumerate(zip(got[b], want[b])) if x != y), None)}")


def test_passA_tokens_are_valid():
    """Tokens must describe real matches: byte equality over [s, s+ml),
    disjoint coverage in order, min offset respected."""
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import pA_call, unpack_tokens
    from lizard_tpu.format.constants import LASTLITERALS, MINMATCH
    blocks = _mk_blocks(23)
    w32i, meta = pack_blocks(blocks, CFG)
    packed = p1_call(jnp.asarray(w32i), jnp.asarray(meta), CFG,
                     interpret=True)
    tok = pA_call(jnp.asarray(w32i), packed, jnp.asarray(meta), CFG,
                  interpret=True)
    got = unpack_tokens(tok, CFG)
    for b, data in enumerate(blocks):
        u8 = np.frombuffer(data, np.uint8)
        n = len(data)
        end = 0
        for (s, ml, d) in got[b]:
            assert ml >= MINMATCH and s >= end
            assert CFG.min_offset <= d <= CFG.maxoff
            assert s + ml <= n - LASTLITERALS
            assert np.array_equal(u8[s:s + ml], u8[s - d:s - d + ml])
            end = s + ml


def _lane_encode(blocks, level=10):
    from lizard_tpu.ops.enc_lanes import encode_blocks_lanes
    return encode_blocks_lanes(blocks, level=level, cfg=CFG,
                               interpret=True)


def test_lane_encode_roundtrip():
    from lizard_tpu.ref.block_decode import decompress
    blocks = _mk_blocks(31)
    encs = _lane_encode(blocks)
    for d, e in zip(blocks, encs):
        assert bytes(decompress(e, max_out=max(len(d), 1))) == d


def test_lane_encode_edge_sizes():
    from lizard_tpu.ref.block_decode import decompress
    from lizard_tpu.utils.datagen import gen
    blocks = [gen(sz, sz, proba=0.5)
              for sz in (0, 1, 3, 19, 20, 21, 22, 64, 511, 4097)]
    encs = _lane_encode(blocks)
    for d, e in zip(blocks, encs):
        assert bytes(decompress(e, max_out=max(len(d), 1))) == d


def test_lane_encode_compresses():
    from lizard_tpu.utils.datagen import gen, text_like
    blocks = [gen(CFG.n, 1, proba=0.7), text_like(CFG.n, 2)]
    encs = _lane_encode(blocks)
    assert len(encs[0]) < 0.75 * CFG.n
    assert len(encs[1]) < 0.8 * CFG.n


def test_lane_encode_streams_multiblock():
    from lizard_tpu.ref.block_decode import decompress
    from lizard_tpu.ops.enc_lanes import encode_streams_lanes
    from lizard_tpu.utils.datagen import gen
    d = gen(3 * CFG.n + 777, 9, proba=0.6)
    s = encode_streams_lanes([d], level=11, cfg=CFG, interpret=True)[0]
    assert bytes(decompress(s, max_out=len(d))) == d


def test_lane_encode_liblizard_interop():
    """Streams must decode with the reference library itself."""
    import pytest
    oracle = pytest.importorskip("tests.oracle")
    oracle.require_oracle()
    lib = oracle._load()
    o = oracle.Oracle(lib)
    from lizard_tpu.utils.datagen import gen, text_like
    for d in (gen(CFG.n, 4, proba=0.65), text_like(CFG.n, 5),
              b"abcdefgh" * 1000, gen(5000, 6, proba=0.4)):
        e = _lane_encode([d])[0]
        assert o.decompress(e, len(d)) == d


def test_frame_roundtrip_lanes_engine():
    """compress_frame_tpu(engine='lanes') round-trips (interpret mode is
    auto-selected on the CPU backend). Small sizes keep interpret fast."""
    from lizard_tpu.frame import compress_frame_tpu, decompress_frame
    from lizard_tpu.utils.datagen import gen
    d = gen(40000, 13, proba=0.62)
    f = compress_frame_tpu(d, level=11, engine="lanes")
    assert decompress_frame(f) == d


def test_api_compress_tpu_backend():
    import pytest
    from lizard_tpu.api import compress, decompress
    from lizard_tpu.utils.datagen import gen
    d = gen(50000, 17, proba=0.6)
    out = compress(d, level=11, backend="tpu")
    assert decompress(out, max_out=len(d)) == d
    out = compress(d, level=25, backend="tpu")
    assert decompress(out, max_out=len(d)) == d
    out = compress(d, level=35, backend="tpu")
    assert decompress(out, max_out=len(d)) == d
    with pytest.raises(ValueError):
        compress(d, level=55, backend="tpu")


def test_token_overflow_falls_back():
    """A token buffer too small for the parse must be detected (not
    silently truncated) and the group re-encoded via the fallback."""
    import dataclasses
    import pytest
    from lizard_tpu.ref.block_decode import decompress
    from lizard_tpu.ops.enc_lanes import (encode_blocks_lanes, p1_call,
                                          pA_call, unpack_token_arrays,
                                          TokenOverflow)
    tiny = dataclasses.replace(CFG, tok_rows=2)
    from lizard_tpu.utils.datagen import gen
    blocks = [gen(CFG.n, s, proba=0.7) for s in range(3)]
    import jax.numpy as jnp
    w32i, meta = pack_blocks(blocks, tiny)
    pk = p1_call(jnp.asarray(w32i), jnp.asarray(meta), tiny,
                 interpret=True)
    tok = pA_call(jnp.asarray(w32i), pk, jnp.asarray(meta), tiny,
                  interpret=True)
    with pytest.raises(TokenOverflow):
        unpack_token_arrays(tok, tiny)
    encs = encode_blocks_lanes(blocks, level=10, cfg=tiny,
                               interpret=True)
    for d, e in zip(blocks, encs):
        assert bytes(decompress(e, max_out=len(d))) == d


def test_lane_encode_liz_roundtrip():
    """Levels 20-29 serialize LIZv1 codewords from the same parse."""
    from lizard_tpu.ref.block_decode import decompress
    blocks = _mk_blocks(41)
    encs = _lane_encode(blocks, level=21)
    for d, e in zip(blocks, encs):
        assert bytes(decompress(e, max_out=max(len(d), 1))) == d


def test_lane_encode_liz_liblizard_interop():
    import pytest
    oracle = pytest.importorskip("tests.oracle")
    oracle.require_oracle()
    o = oracle.Oracle(oracle._load())
    from lizard_tpu.utils.datagen import gen, text_like
    for d in (gen(CFG.n, 8, proba=0.65), text_like(CFG.n, 9),
              b"0123456789abcdef" * 512):
        e = _lane_encode([d], level=22)[0]
        assert o.decompress(e, len(d)) == d


def test_frame_roundtrip_liz_lanes():
    from lizard_tpu.frame import compress_frame_tpu, decompress_frame
    from lizard_tpu.utils.datagen import gen
    d = gen(50000, 29, proba=0.6)
    f = compress_frame_tpu(d, level=24)
    assert decompress_frame(f) == d


def test_p1_far_reach_64k_cfg():
    """Exercises the dynamic-reach verify far loop: matches ~20-30 KB
    back under a 64K-class maxoff."""
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import unpack_d16
    cfg = EncCfg(n=32768, hl=11, maxoff=30000,
                 probes=(8, 16, 64, 256, 1024))
    from lizard_tpu.utils.datagen import gen
    rng = np.random.default_rng(3)
    chunk = gen(9000, 77, proba=0.5)
    filler = bytes(rng.integers(0, 256, 12000, dtype=np.uint8))
    blocks = [chunk + filler + chunk,                  # match 21000 back
              gen(cfg.n, 5, proba=0.6), b"", b"", b"", b"", b"", b""]
    w32i, meta = pack_blocks(blocks, cfg)
    packed = p1_call(jnp.asarray(w32i), jnp.asarray(meta), cfg,
                     interpret=True)
    got = unpack_d16(packed, cfg)
    ref, _ = p1_reference(blocks, cfg)
    assert np.array_equal(got[0], ref[0]) and np.array_equal(got[1], ref[1])
    assert (ref[0] > 16384).any()          # far candidates really exist
    # and the full pipeline round-trips at a 64K level
    from lizard_tpu.ops.enc_lanes import encode_blocks_lanes
    from lizard_tpu.ref.block_decode import decompress
    e = encode_blocks_lanes([blocks[0]], level=11, cfg=cfg,
                            interpret=True)[0]
    assert bytes(decompress(e, max_out=len(blocks[0]))) == blocks[0]
    assert len(e) < 0.75 * len(blocks[0])  # the far match was used


def test_lane_encode_huffman_families():
    """Levels 30-49 add the Huff0 entropy stage over the same parse."""
    from lizard_tpu.ref.block_decode import decompress
    from lizard_tpu.utils.datagen import gen, text_like
    blocks = [text_like(CFG.n, 51), gen(CFG.n, 52, proba=0.7)]
    sizes = {}
    for level in (11, 31, 21, 41):
        encs = _lane_encode(blocks, level=level)
        for d, e in zip(blocks, encs):
            assert bytes(decompress(e, max_out=len(d))) == d
        sizes[level] = sum(map(len, encs))
    # the entropy stage must help on text-heavy input
    assert sizes[31] < sizes[11]
    assert sizes[41] < sizes[21]


def test_lane_encode_huffman_interop():
    import pytest
    oracle = pytest.importorskip("tests.oracle")
    oracle.require_oracle()
    o = oracle.Oracle(oracle._load())
    from lizard_tpu.utils.datagen import text_like
    d = text_like(CFG.n, 53)
    for level in (35, 45):
        e = _lane_encode([d], level=level)[0]
        assert o.decompress(e, len(d)) == d


def test_passA_lazy_matches_reference():
    """Lazy selection (levels 11+) must be token-exact vs the mirror."""
    import dataclasses
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import pA_call, p2_reference, \
        unpack_tokens
    cfg = dataclasses.replace(CFG, lazy=True)
    blocks = _mk_blocks(61)
    w32i, meta = pack_blocks(blocks, cfg)
    packed = p1_call(jnp.asarray(w32i), jnp.asarray(meta), cfg,
                     interpret=True)
    tok = pA_call(jnp.asarray(w32i), packed, jnp.asarray(meta), cfg,
                  interpret=True)
    got = unpack_tokens(tok, cfg)
    want = p2_reference(blocks, cfg)
    for b in range(8):
        assert got[b] == want[b], (
            f"block {b}: {len(got[b])} vs {len(want[b])}; first diff: "
            f"{next(((i, x, y) for i, (x, y) in enumerate(zip(got[b], want[b])) if x != y), None)}")


def test_p1_h5_dual_table_matches_reference():
    """The 5-byte-hash second table (levels 12+) must stay bit-exact
    vs the mirror and improve the candidate count."""
    import dataclasses
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import unpack_d16
    cfg = dataclasses.replace(CFG, k5=1, lazy=True)
    blocks = _mk_blocks(71)
    w32i, meta = pack_blocks(blocks, cfg)
    packed = p1_call(jnp.asarray(w32i), jnp.asarray(meta), cfg,
                     interpret=True)
    got = unpack_d16(packed, cfg)
    ref, _ = p1_reference(blocks, cfg)
    assert np.array_equal(got, ref)
    base, _ = p1_reference(blocks, dataclasses.replace(CFG, lazy=True))
    assert (ref > 0).sum() >= (base > 0).sum()
    # full pipeline round-trips at a 12-class level
    from lizard_tpu.ops.enc_lanes import encode_blocks_lanes
    from lizard_tpu.ref.block_decode import decompress
    encs = encode_blocks_lanes(blocks, level=12, cfg=cfg, interpret=True)
    for d, e in zip(blocks, encs):
        assert bytes(decompress(e, max_out=max(len(d), 1))) == d


def test_passA_il2_matches_reference():
    """Two interleaved groups must each emit exactly their mirror's
    token lists (shared iteration counter, stacked buffers)."""
    import dataclasses
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import (pA_call, p2_reference,
                                          unpack_tokens, _maxrows)
    cfg = dataclasses.replace(CFG, lazy=True)
    blocksA = _mk_blocks(81)
    blocksB = _mk_blocks(82)[::-1]
    w32A, metaA = pack_blocks(blocksA, cfg)
    w32B, metaB = pack_blocks(blocksB, cfg)
    pkA = p1_call(jnp.asarray(w32A), jnp.asarray(metaA), cfg,
                  interpret=True)
    pkB = p1_call(jnp.asarray(w32B), jnp.asarray(metaB), cfg,
                  interpret=True)
    w32 = np.concatenate([w32A, w32B], axis=0)
    pk = np.concatenate([np.asarray(pkA), np.asarray(pkB)], axis=0)
    meta = np.concatenate([metaA, metaB])
    tok = np.asarray(pA_call(jnp.asarray(w32), jnp.asarray(pk),
                             jnp.asarray(meta), cfg, interpret=True,
                             il=2))
    TR = (_maxrows(cfg) + 1) * 8
    for g, blocks in enumerate((blocksA, blocksB)):
        got = unpack_tokens(tok[g * TR:(g + 1) * TR], cfg)
        want = p2_reference(blocks, cfg)
        for b in range(8):
            assert got[b] == want[b], f"group {g} block {b}"


def test_p1_passA_k5_chain_matches_reference():
    """k5=2 rotating-slot chain: phase 1 maps and the multi-candidate
    parse must both be exact vs the mirrors, and round-trip."""
    import dataclasses
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import (pA_call, p2_reference,
                                          unpack_tokens, unpack_d16,
                                          encode_blocks_lanes)
    cfg = dataclasses.replace(CFG, k5=2, lazy=True)
    blocks = _mk_blocks(91)
    w32i, meta = pack_blocks(blocks, cfg)
    packed = p1_call(jnp.asarray(w32i), jnp.asarray(meta), cfg,
                     interpret=True)
    ref, _ = p1_reference(blocks, cfg)          # (8, 3, n)
    for m in range(cfg.nmaps):
        got = unpack_d16(packed, cfg, m=m)
        assert np.array_equal(got, ref[:, m]), f"map {m}"
    tok = pA_call(jnp.asarray(w32i), packed, jnp.asarray(meta), cfg,
                  interpret=True)
    got = unpack_tokens(tok, cfg)
    want = p2_reference(blocks, cfg, dmap=ref)
    for b in range(8):
        assert got[b] == want[b], (
            f"block {b}: {len(got[b])} vs {len(want[b])}; first diff: "
            f"{next(((i, x, y) for i, (x, y) in enumerate(zip(got[b], want[b])) if x != y), None)}")
    from lizard_tpu.ref.block_decode import decompress
    encs = encode_blocks_lanes(blocks, level=14, cfg=cfg, interpret=True)
    for d, e in zip(blocks, encs):
        assert bytes(decompress(e, max_out=max(len(d), 1))) == d


def test_p1_passA_hashchain_matches_reference():
    """chain>0 (d16 DELTA-map hash-chain walk, the hashChain-level
    analog): the delta map, the phase-1.5 vectorized walk (p15) and the
    parse over the pre-picked winner must all be exact vs the mirrors,
    and round-trip at a chain-tier level."""
    import dataclasses
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import (pA_call, p2_reference,
                                          p15_call, p15_reference,
                                          unpack_tokens, unpack_d16,
                                          encode_blocks_lanes)
    cfg = dataclasses.replace(CFG, chain=2, lazy=True)
    blocks = _mk_blocks(19)
    w32i, meta = pack_blocks(blocks, cfg)
    packed = p1_call(jnp.asarray(w32i), jnp.asarray(meta), cfg,
                     interpret=True)
    ref, _ = p1_reference(blocks, cfg)          # (8, 2, n): cand + delta
    for m in range(cfg.nmaps):
        got = unpack_d16(packed, cfg, m=m)
        assert np.array_equal(got, ref[:, m]), f"map {m}"
    win = p15_call(jnp.asarray(w32i), packed, jnp.asarray(meta), cfg,
                   interpret=True)
    wref = p15_reference(blocks, cfg, dmap=ref)
    pa_cfg = dataclasses.replace(cfg, chain=0)
    for m in range(pa_cfg.nmaps):
        got = unpack_d16(win, pa_cfg, m=m)
        want = wref if pa_cfg.nmaps == 1 else wref[:, m]
        assert np.array_equal(got, want), f"p15 map {m}"
    tok = pA_call(jnp.asarray(w32i), win, jnp.asarray(meta), pa_cfg,
                  interpret=True)
    got = unpack_tokens(tok, pa_cfg)
    want = p2_reference(blocks, cfg, dmap=ref)   # pre-picks internally
    for b in range(8):
        assert got[b] == want[b], (
            f"block {b}: {len(got[b])} vs {len(want[b])}; first diff: "
            f"{next(((i, x, y) for i, (x, y) in enumerate(zip(got[b], want[b])) if x != y), None)}")
    from lizard_tpu.ref.block_decode import decompress
    encs = encode_blocks_lanes(blocks, level=17, cfg=cfg, interpret=True)
    for d, e in zip(blocks, encs):
        assert bytes(decompress(e, max_out=max(len(d), 1))) == d


@pytest.mark.parametrize("combo", [
    dict(lazy=True, k5=0, maxoff=2047),
    dict(lazy=False, k5=1, maxoff=2047),
    dict(lazy=True, k5=2, maxoff=1023),
    dict(lazy=True, k5=4, maxoff=2047),
    dict(lazy=True, k5=2, chain=2, maxoff=2047),
    dict(lazy=True, k5=0, chain=3, pref=16, maxoff=2047),
])
def test_passA_cfg_sweep(combo):
    """Kernel/mirror token parity across tier-parameter combinations on
    adversarial inputs (runs, periodicity, block-tail edges)."""
    import dataclasses
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import (pA_call, p2_reference,
                                          unpack_tokens)
    cfg = dataclasses.replace(CFG, **combo)
    rng = np.random.default_rng(combo["k5"] * 7 + combo["maxoff"])
    from lizard_tpu.utils.datagen import gen, text_like
    blocks = [
        gen(CFG.n, 1, proba=0.8),
        text_like(CFG.n - 1, 2),
        bytes(np.tile(np.frombuffer(b"abcdefgh", np.uint8), CFG.n // 8)),
        (b"A" * 200 + bytes(rng.integers(0, 256, 57, np.uint8))) * 20,
        gen(CFG.n // 2 + 21, 3, proba=0.3),
        bytes(rng.integers(0, 4, CFG.n, np.uint8)),     # tiny alphabet
        gen(127, 4, proba=0.7),
        b"\x00" * (CFG.n // 4),
    ]
    w32i, meta = pack_blocks(blocks, cfg)
    pk = p1_call(jnp.asarray(w32i), jnp.asarray(meta), cfg,
                 interpret=True)
    pa_cfg = cfg
    if cfg.chain:
        from lizard_tpu.ops.enc_lanes import p15_call
        pk = p15_call(jnp.asarray(w32i), pk, jnp.asarray(meta), cfg,
                      interpret=True)
        pa_cfg = dataclasses.replace(cfg, chain=0)
    tok = pA_call(jnp.asarray(w32i), pk, jnp.asarray(meta), pa_cfg,
                  interpret=True)
    got = unpack_tokens(tok, pa_cfg)
    want = p2_reference(blocks, cfg)
    for b in range(8):
        assert got[b] == want[b], (
            f"{combo} block {b}: first diff "
            f"{next(((i, x, y) for i, (x, y) in enumerate(zip(got[b], want[b])) if x != y), None)}")


def test_lane_frame_corruption_detected():
    """Corrupting a lanes-compressed frame must raise, not decode."""
    import pytest
    from lizard_tpu.frame import compress_frame_tpu, decompress_frame, \
        FrameError
    from lizard_tpu.utils.datagen import gen
    d = gen(60000, 99, proba=0.6)
    f = bytearray(compress_frame_tpu(d, level=12, engine="lanes"))
    f[len(f) // 2] ^= 0x41
    with pytest.raises((FrameError, ValueError)):
        out = decompress_frame(bytes(f))
        if out != d:                     # corrupt-but-decodable payload
            raise ValueError("content checksum mismatch")


def test_encode_blocks_sharded_multichip():
    """Data-parallel lane encode over the virtual 8-device mesh: each
    device parses one 8-block group (p1 + p15 chain walk + pass A under
    shard_map); outputs must match the single-device pipeline exactly
    and round-trip."""
    import dataclasses
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from lizard_tpu.ops.enc_lanes import encode_blocks_lanes
    from lizard_tpu.parallel.pipeline import encode_blocks_sharded
    from lizard_tpu.ref.block_decode import decompress
    from lizard_tpu.utils.datagen import gen, text_like

    cfg = dataclasses.replace(CFG, n=4096, maxoff=2047, lazy=1, chain=2)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    blocks = [gen(cfg.n - 3 * i, seed=70 + i, proba=0.6)
              for i in range(17)] + [text_like(cfg.n, 99), b"", b"abc"]
    got = encode_blocks_sharded(blocks, level=17, cfg=cfg, mesh=mesh,
                                interpret=True)
    want = encode_blocks_lanes(blocks, level=17, cfg=cfg, interpret=True)
    assert got == want, "sharded != single-device streams"
    for d, e in zip(blocks, got):
        assert bytes(decompress(e, max_out=max(len(d), 1))) == d


# ------------------------------------------------------- off24 far maps

FAR_CFG = EncCfg(n=8192, hl=10, maxoff=2047, far=1, far_dist=2048,
                 probes=(8, 12, 16, 24, 32, 64, 128, 256))


def _mk_far_blocks(seed=0):
    """Blocks whose redundancy sits inside the far window
    [far_dist, 2*far_dist-2] = [2048, 4094]."""
    from lizard_tpu.utils.datagen import gen, text_like
    rng = np.random.default_rng(seed)
    head = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    return [
        head[:3000] + head[:3000] + head[:2000],  # repeats at d=3000
        gen(3000, seed, proba=0.5) + head[:2500] + head[:2500],
        text_like(CFG.n, seed + 1),             # near+far mixed text
        head[:1500] + head[:1500] + head[:1500],  # below + at far_dist
        bytes(rng.integers(0, 256, 8192, dtype=np.uint8)),
        b"\x37" * 6000,                         # RLE
        gen(100, seed + 2, proba=0.6),
        b"",
    ]


def test_far_p1_matches_reference():
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import unpack_d16
    blocks = _mk_far_blocks(5)
    w32i, meta = pack_blocks(blocks, FAR_CFG)
    packed = p1_call(jnp.asarray(w32i), jnp.asarray(meta), FAR_CFG,
                     interpret=True)
    ref, _ = p1_reference(blocks, FAR_CFG)
    for m in range(FAR_CFG.nmaps):
        got = unpack_d16(packed, FAR_CFG, m)
        for b in range(8):
            neq = np.nonzero(got[b] != ref[b][m])[0]
            assert neq.size == 0, (
                f"map {m} block {b}: {neq.size} mismatches at {neq[:5]}: "
                f"got {got[b][neq[:5]]} want {ref[b][m][neq[:5]]}")


def test_far_passA_matches_reference():
    import jax.numpy as jnp
    from lizard_tpu.ops.enc_lanes import pA_call, p2_reference, \
        unpack_tokens
    blocks = _mk_far_blocks(6)
    w32i, meta = pack_blocks(blocks, FAR_CFG)
    packed = p1_call(jnp.asarray(w32i), jnp.asarray(meta), FAR_CFG,
                     interpret=True)
    tok = pA_call(jnp.asarray(w32i), packed, jnp.asarray(meta), FAR_CFG,
                  interpret=True)
    got = unpack_tokens(np.asarray(tok), FAR_CFG)
    want = p2_reference(blocks, FAR_CFG, None)
    for b in range(8):
        assert got[b] == want[b], (
            f"block {b}: first diff "
            f"{next((i, x, y) for i, (x, y) in enumerate(zip(got[b], want[b])) if x != y)}"
            if len(got[b]) == len(want[b]) else
            f"block {b}: {len(got[b])} vs {len(want[b])} tokens")
    # the far map must actually contribute: the pure-far block's parse
    # must contain far-class matches (d >= far_dist, ml >= 16)
    fars = [t for t in got[0] if t[2] >= FAR_CFG.far_dist]
    assert fars and all(t[1] >= 16 for t in fars)


def test_far_roundtrip_level21():
    """End-to-end: level-21 lane encode of far-redundant data decodes
    bit-exactly and beats the near-only ratio."""
    import dataclasses
    from lizard_tpu.ops.enc_lanes import encode_blocks_lanes
    from lizard_tpu.ref.block_decode import decompress
    rng = np.random.default_rng(17)
    head = rng.integers(0, 256, 3000, dtype=np.uint8).tobytes()
    d = head + head + head[:2000]          # repeats at distance 3000
    far_cfg = dataclasses.replace(FAR_CFG, lazy=1)
    comp = encode_blocks_lanes([d], level=21, cfg=far_cfg,
                               interpret=True)[0]
    assert bytes(decompress(comp, max_out=len(d))) == d
    near_cfg = dataclasses.replace(far_cfg, far=0)
    comp_near = encode_blocks_lanes([d], level=21, cfg=near_cfg,
                                    interpret=True)[0]
    assert len(comp) < len(comp_near) - 2000, (len(comp), len(comp_near))
