"""lizard_tpu: a TPU-native reimplementation of the Lizard (LZ5) codec.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
C library ``inikep/lizard`` (mounted read-only at /root/reference):

- the four method families fastLZ4 / LIZv1 / +Huffman, compression levels
  10..49 (CLI -10..-49)
- the block format (5 separated streams per 128 KB block) and the frame
  format (magic/descriptor/blocks/endmark/xxh32)
- one-shot, streaming, and file/CLI APIs

Architecture (TPU-first, not a port):

- ``lizard_tpu.format``   -- formats as pure data (constants, level table)
- ``lizard_tpu.ref``      -- bit-exact scalar oracle (NumPy/Python): pins the
                             semantics, golden-tested against liblizard
- ``lizard_tpu.ops``      -- JAX/Pallas batched kernels (token scan, match
                             resolution, Huffman tables) operating on
                             struct-of-arrays batches of blocks
- ``lizard_tpu.parallel`` -- shard_map pipelines over a device Mesh: frame
                             blocks scattered data-parallel, ragged gather in
                             frame order
- ``lizard_tpu.frame``    -- frame container assemble/parse
"""

__version__ = "0.1.0"

import os as _os


def _enable_jax_compile_cache():
    """Persistent XLA compile cache (works through the axon compile
    service; verified to cut warm-process kernel compiles from minutes
    to seconds). Opt out with LIZARD_TPU_NO_JAX_CACHE=1."""
    if _os.environ.get("LIZARD_TPU_NO_JAX_CACHE"):
        return
    try:
        import jax

        cache = _os.environ.get(
            "LIZARD_TPU_JAX_CACHE",
            _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


_enable_jax_compile_cache()

from lizard_tpu.api import (  # noqa: F401
    compress,
    decompress,
    compress_frame,
    decompress_frame,
)
