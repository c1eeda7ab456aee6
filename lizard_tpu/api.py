"""Top-level one-shot API, mirroring the reference's public surface
(lib/lizard_compress.h:99-198, lib/lizard_decompress.h:73-145,
lib/lizard_frame.h:131-297) with Pythonic signatures.

Backends:
- "ref":  scalar oracle (always available, slow, bit-exact)
- "jax":  batched JAX/Pallas path (default where available)
"""

import logging

from lizard_tpu.format.constants import LIZARD_DEFAULT_CLEVEL

logger = logging.getLogger("lizard_tpu")


def compress(data: bytes, level: int = LIZARD_DEFAULT_CLEVEL,
             backend: str = "ref", max_out: int | None = None) -> bytes:
    """One-shot block-stream compression (Lizard_compress equivalent).

    backend="ref": bit-exact scalar encoder (byte-identical to liblizard,
    all 40 levels). backend="native": the fast C++ host encoder (all 40
    levels, both codeword families + Huff0 stage, valid-but-not-identical
    streams, ~100-1000x faster).

    max_out models the reference's maxDstSize budget
    (lizard_compress.c:583-599, returns 0 when the output does not fit):
    raises ValueError when the compressed stream exceeds it; a budget of
    exactly len(result) succeeds."""
    if backend == "ref":
        from lizard_tpu.ref.block_encode import compress as _c
        out = _c(data, level)
    elif backend == "native":
        from lizard_tpu import runtime as _rt
        out = _rt.compress(data, level, max_out=max_out)
    elif backend == "tpu":
        # Pallas lane pipeline (ops/enc_lanes.py), all four families;
        # the Huffman families' entropy stage runs native on host
        if not 10 <= level <= 49:
            raise ValueError("backend='tpu' supports levels 10-49")
        from lizard_tpu.ops.enc_lanes import encode_streams_lanes
        out = encode_streams_lanes([data], level=level)[0]
    else:
        raise NotImplementedError(backend)
    if max_out is not None and len(out) > max_out:
        raise ValueError(
            f"compressed size {len(out)} exceeds max_out {max_out}")
    return out


def decompress(data: bytes, max_out: int | None = None, backend: str = "ref") -> bytes:
    """One-shot block-stream decompression (Lizard_decompress_safe)."""
    if backend == "ref":
        from lizard_tpu.ref.block_decode import decompress as _d
        return _d(data, max_out)
    if backend == "jax":
        from lizard_tpu.ops.decode import decompress_jax
        return decompress_jax(data, max_out)
    raise NotImplementedError(backend)


def compress_frame(data: bytes, level: int = LIZARD_DEFAULT_CLEVEL, **kw) -> bytes:
    from lizard_tpu.frame import compress_frame as _cf
    return _cf(data, level, **kw)


def decompress_frame(data: bytes, backend: str = "auto", **kw) -> bytes:
    """Frame decode. backend="lanes" forces the TPU lane-parallel kernel and
    surfaces its errors; "auto" uses it for eligible frames (blockIndependent,
    compressed size > 1 MB) on a TPU backend and falls back to the scalar
    path on any eligibility or runtime failure."""
    from lizard_tpu.frame import decompress_frame as _df
    if backend == "lanes":
        from lizard_tpu.frame import decompress_frame_lanes
        return decompress_frame_lanes(data, **kw)
    if backend == "auto":
        try:
            import jax
            if jax.default_backend() == "tpu" and len(data) > (1 << 20):
                from lizard_tpu.frame import decompress_frame_lanes
                return decompress_frame_lanes(data, **kw)
        except ValueError as e:
            # Ineligible frame shape (FrameError or a lane-path ValueError):
            # expected for linked/small frames; the scalar path decodes it.
            logger.debug("lane decode ineligible (%s); scalar path", e)
        except ImportError as e:
            logger.debug("jax unavailable (%s); scalar path", e)
        except Exception as e:
            # An XLA/runtime failure on an ELIGIBLE frame is a kernel
            # regression, not a routine fallback -- make it visible instead
            # of silently eating a ~1000x slowdown.
            logger.warning(
                "TPU lane decode failed (%s: %s); falling back to the "
                "scalar decoder", type(e).__name__, e)
    kw.pop("interpret", None)
    return _df(data, **kw)
