"""TPU Huff0 encoder (ops/enc_huf.py): the lane bit-packing kernel must
be BIT-identical to the reference-exact host encoder
(ref/huf_encode._huf_encode_1x) so huf_compress_tpu blobs are
byte-identical Huff0 — decodable by our decoders and liblizard."""

import numpy as np
import pytest


def _tables_for(c):
    from lizard_tpu.ref.huf_encode import (HUF_TABLELOG_DEFAULT,
                                           _fse_count,
                                           fse_optimal_table_log,
                                           huf_build_ctable)
    count, max_sym, _ = _fse_count(c, 255)
    hl = fse_optimal_table_log(HUF_TABLELOG_DEFAULT, len(c), max_sym,
                               minus=1)
    nb, val, hl = huf_build_ctable(count, max_sym, hl)
    return val, nb


def test_stream_bit_exact():
    """8 simultaneous streams (one per sublane), mixed sizes/alphabets,
    each bit-identical to the serial BitWriter encoder."""
    from lizard_tpu.ops.enc_huf import huf_encode_streams_tpu
    from lizard_tpu.ref.huf_encode import _huf_encode_1x
    from lizard_tpu.utils.datagen import gen, text_like
    rng = np.random.default_rng(5)
    cases = [text_like(5000, 1), gen(8000, 2, proba=0.8),
             bytes(rng.integers(0, 12, 3000, np.uint8)),
             text_like(317, 3), gen(129, 4, proba=0.5),
             bytes([7]) * 100 + bytes(rng.integers(0, 255, 50,
                                                   np.uint8)),
             text_like(20000, 6), b"ab"]
    tables = [_tables_for(c) for c in cases]
    got = huf_encode_streams_tpu(cases, tables, interpret=True)
    for i, (c, (val, nb)) in enumerate(zip(cases, tables)):
        assert got[i] == _huf_encode_1x(c, val, nb), f"stream {i}"


def test_blob_byte_identical():
    """huf_compress_tpu == ref huf_compress (header + jump + 4 streams),
    including the not-compressible/RLE gates."""
    from lizard_tpu.ops.enc_huf import huf_compress_tpu
    from lizard_tpu.ref.huf_encode import huf_compress
    from lizard_tpu.utils.datagen import gen, text_like
    rng = np.random.default_rng(9)
    for d in (text_like(60000, 11), gen(30000, 12, proba=0.7),
              bytes(rng.integers(0, 256, 4000, np.uint8)),  # incompressible
              b"\x42" * 500,                                # rle
              gen(1000, 13, proba=0.3)):
        assert huf_compress_tpu(d, interpret=True) == huf_compress(d)


def test_huf_roundtrip_decoders():
    """TPU-encoded blobs decode with our bit-exact Huff0 decoder."""
    from lizard_tpu.ops.enc_huf import huf_compress_tpu
    from lizard_tpu.ref.huf import huf_decompress
    from lizard_tpu.utils.datagen import text_like
    d = text_like(40000, 21)
    blob = huf_compress_tpu(d, interpret=True)
    assert blob is not None and len(blob) > 1
    assert bytes(huf_decompress(blob, len(d))) == d


def test_block_assembly_tpu_huf_backend(monkeypatch):
    """assemble_block with LIZARD_TPU_HUF=tpu emits byte-identical
    level 30/40 inner blocks (and they round-trip)."""
    monkeypatch.setenv("LIZARD_TPU_HUF", "tpu")
    import dataclasses
    from lizard_tpu.ops.enc_lanes import EncCfg, encode_blocks_lanes
    from lizard_tpu.ref.block_decode import decompress
    from lizard_tpu.utils.datagen import text_like
    cfg = EncCfg(n=8192, hl=10, maxoff=2047,
                 probes=(8, 12, 16, 24, 32, 64, 128, 256))
    blocks = [text_like(8192, 31), text_like(8192, 32)]
    encs = encode_blocks_lanes(blocks, level=35, cfg=cfg, interpret=True)
    monkeypatch.delenv("LIZARD_TPU_HUF")
    want = encode_blocks_lanes(blocks, level=35, cfg=cfg, interpret=True)
    assert encs == want, "tpu huf backend changed the stream bytes"
    for d, e in zip(blocks, encs):
        assert bytes(decompress(e, max_out=len(d))) == d
