"""Multi-host (multi-process) decode scaffolding.

On a real pod each host runs one process; `init_process` wires
jax.distributed so `jax.devices()` spans every host's chips, and the
decode step from parallel/pipeline.py runs unchanged over the global mesh
-- shard_map + the block-length all_gather compile identically whether the
"dp" axis crosses ICI or DCN; only topology differs. Without multi-host
hardware in this environment, the same code path is validated on the
virtual 8-device CPU mesh by __graft_entry__.dryrun_multichip.

Mapping of the reference's distribution story: the codec has no
tensor/pipeline dimension -- its one parallel axis is independent frame
blocks (SURVEY.md section 2.5) -- so multi-host is pure dp plus one
collective: the all-gather of per-block decoded sizes that gives every
process the global output offsets (programs/ in the reference do this
with a serial write loop; here offsets are known everywhere, so each host
can pwrite its shard of a shared file without coordination).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_process(coordinator_address: str | None = None,
                 num_processes: int | None = None,
                 process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-host run. No-op (returns
    False) when single-process, so the same program runs on one host or a
    pod. Call before any other jax API, one call per process."""
    if not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(axis: str = "dp") -> Mesh:
    """A 1-D mesh over every device of every participating process."""
    return Mesh(np.array(jax.devices()), (axis,))


def decode_streams_global(streams: list[bytes], max_stream_out: int,
                          mesh: Mesh | None = None):
    """Decode independent streams over the global mesh, returning
    (results, global_offsets): results as decode_streams_sharded, plus the
    per-block global output offsets computed ON DEVICE via the all-gather
    step -- the information each process needs to place its shard's output
    into a global file/buffer without any host exchange."""
    from lizard_tpu.format.levels import Codewords
    from lizard_tpu.ops.split import finalize, new_accumulator, split_stream
    from lizard_tpu.ops.decode import GUARD
    from lizard_tpu.parallel.pipeline import (_group, _pad_to,
                                              make_sharded_decoder)

    if mesh is None:
        mesh = global_mesh()
    n_shards = int(mesh.devices.size)
    if not streams:
        return [], np.zeros((n_shards, 0), np.int32)

    assign = _group(len(streams), n_shards)
    shard_batches = []
    shard_streams_idx = [[] for _ in range(n_shards)]
    for s in range(n_shards):
        acc = new_accumulator()
        fam = None
        for i, stream in enumerate(streams):
            if assign[i] == s:
                fam = split_stream(stream, acc, i)
                shard_streams_idx[s].append(i)
        shard_batches.append(finalize(acc, fam or Codewords.LIZv1))

    family = next((b.codewords for b in shard_batches if b.n_blocks),
                  Codewords.LZ4)
    bmax = max(max((b.n_blocks for b in shard_batches), default=1), 1)
    caps = [max(max((len(getattr(b, f)) for b in shard_batches), default=1),
                1) + GUARD
            for f in ("flags", "literals", "off16", "off24")]
    max_steps = max(max((b.max_tokens for b in shard_batches), default=0), 1)
    max_tokens_total = max(max((int((b.flags_len + 1).sum())
                                for b in shard_batches if b.n_blocks),
                               default=1), bmax + 1)
    out_cap = max(max(len(g) for g in shard_streams_idx), 1) * max_stream_out

    def stack_u8(field, cap):
        return np.stack([_pad_to(getattr(b, field), cap, np.uint8)
                         for b in shard_batches])

    def stack_i32(field):
        return np.stack([_pad_to(getattr(b, field), bmax, np.int32)
                         for b in shard_batches])

    flags_len = np.stack([
        np.where(np.arange(bmax) < b.n_blocks,
                 _pad_to(b.flags_len, bmax, np.int32), -1).astype(np.int32)
        for b in shard_batches])

    arrays = (stack_u8("flags", caps[0]), stack_u8("literals", caps[1]),
              stack_u8("off16", caps[2]), stack_u8("off24", caps[3]),
              stack_i32("flags_off"), flags_len,
              stack_i32("lit_off"), stack_i32("lit_len"),
              stack_i32("off16_off"), stack_i32("off24_off"))

    decoder = make_sharded_decoder(mesh, out_cap=int(out_cap),
                                   max_steps=int(max_steps),
                                   max_tokens_total=int(max_tokens_total),
                                   family_liz=family == Codewords.LIZv1,
                                   gather_lengths=True)
    sharding = NamedSharding(mesh, P("dp"))
    out, blk_len, all_len, offs = decoder(
        *[jax.device_put(a, sharding) for a in arrays])
    out = np.asarray(out)
    blk_len = np.asarray(blk_len)
    offs = np.asarray(offs)

    results: list[bytes] = [b""] * len(streams)
    for s, batch in enumerate(shard_batches):
        pos = 0
        pieces: dict[int, list[bytes]] = {}
        for bidx in range(batch.n_blocks):
            ln = int(blk_len[s, bidx])
            pieces.setdefault(int(batch.stream_id[bidx]), []).append(
                out[s, pos:pos + ln].tobytes())
            pos += ln
        for sid, chunks in pieces.items():
            results[sid] = b"".join(chunks)
    return results, offs
