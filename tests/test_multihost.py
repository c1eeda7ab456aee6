"""Multi-host decode scaffolding on the virtual 8-device CPU mesh.

The "dp" axis here stands in for a multi-process global mesh; shard_map +
the block-length all_gather compile identically on a pod (see
lizard_tpu/parallel/multihost.py)."""

import numpy as np

from lizard_tpu.parallel.multihost import (decode_streams_global,
                                           global_mesh, init_process)
from lizard_tpu.ref.block_encode import compress
from lizard_tpu.utils.datagen import gen


def test_init_process_single_is_noop():
    assert init_process() is False
    assert init_process(num_processes=1) is False


def test_decode_streams_global_roundtrip():
    datas = [gen(15_000 + i * 777, seed=i, proba=0.6) for i in range(13)]
    streams = [compress(d, 12) for d in datas]
    results, offs = decode_streams_global(streams, 131072)
    assert results == datas
    assert offs.shape[0] == global_mesh().devices.size


def test_global_offsets_match_lengths():
    """The on-device all-gathered offsets must equal the host-computed
    exclusive cumsum of per-block lengths in shard-major order."""
    datas = [gen(9_000 + i * 333, seed=i, proba=0.5) for i in range(10)]
    streams = [compress(d, 12) for d in datas]
    results, offs = decode_streams_global(streams, 131072)
    assert results == datas
    # reconstruct lengths in the same [shard, slot] layout
    from lizard_tpu.parallel.pipeline import _group
    n_shards = offs.shape[0]
    assign = _group(len(streams), n_shards)
    lens = np.zeros_like(offs)
    for s in range(n_shards):
        slot = 0
        for i, d in enumerate(datas):
            if assign[i] == s:
                # level 12 streams here are single-block (< 128 KB)
                lens[s, slot] = len(d)
                slot += 1
    flat = lens.reshape(-1)
    want = (np.cumsum(flat) - flat).reshape(lens.shape)
    assert (offs == want).all()


def test_liz_family_global():
    datas = [gen(12_000 + i * 500, seed=i, proba=0.6) for i in range(6)]
    streams = [compress(d, 21) for d in datas]
    results, _ = decode_streams_global(streams, 131072)
    assert results == datas
