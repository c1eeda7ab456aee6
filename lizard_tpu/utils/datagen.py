"""Deterministic compressible-data generator, equivalent in role to the
reference's programs/datagen.c (RDG): seeded PRNG, tunable match probability
and literal distribution, 32 KB match window.

Not bit-identical to RDG (no golden files depend on generator output); it
fills the same role for property tests and benchmarks.
"""

import numpy as np


def gen(size: int, seed: int = 0, proba: float = 0.70, lit_span: int = 130) -> bytes:
    """Generate `size` bytes; `proba` is the probability a step emits a match
    into the last-32KB window (higher => more compressible)."""
    rng = np.random.default_rng(seed)
    out = bytearray()
    # skewed literal distribution over a limited alphabet, like RDG's table
    lits = rng.zipf(1.3, size=size * 2) % lit_span
    lits = (lits + 32).astype(np.uint8)
    li = 0
    while len(out) < size:
        if len(out) >= 4 and rng.random() < proba:
            max_off = min(len(out), 32 * 1024)
            off = int(rng.integers(1, max_off + 1))
            length = int(rng.integers(4, 68))
            start = len(out) - off
            for i in range(length):
                out.append(out[start + i])
        else:
            n = int(rng.integers(1, 12))
            out += lits[li:li + n].tobytes()
            li += n
            if li + 12 > len(lits):
                li = 0
    return bytes(out[:size])


def text_like(size: int, seed: int = 0) -> bytes:
    """English-ish text: repeated vocabulary for realistic LZ+entropy mix."""
    rng = np.random.default_rng(seed)
    vocab = [b"the", b"quick", b"brown", b"fox", b"jumps", b"over", b"lazy",
             b"dog", b"compression", b"lizard", b"stream", b"block", b"frame",
             b"entropy", b"huffman", b"offset", b"match", b"literal", b"a",
             b"of", b"and", b"in", b"to", b"is", b"was", b"it"]
    words = rng.integers(0, len(vocab), size=size // 3)
    out = bytearray()
    for w in words:
        out += vocab[int(w)] + b" "
        if len(out) >= size:
            break
    return bytes(out[:size])
