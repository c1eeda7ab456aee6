import pytest

from lizard_tpu.utils.xxh import XXH32, xxh32, xxh64
from tests.oracle import require_oracle


@pytest.mark.parametrize("n", [0, 1, 3, 4, 15, 16, 17, 31, 32, 33, 100, 4096, 100_000])
@pytest.mark.parametrize("seed", [0, 1, 0xDEADBEEF])
def test_xxh32_vs_reference(n, seed):
    o = require_oracle()
    import numpy as np
    data = np.random.default_rng(n * 7 + seed).integers(0, 256, n).astype(np.uint8).tobytes()
    assert xxh32(data, seed) == o.xxh32(data, seed)


@pytest.mark.parametrize("n", [0, 1, 7, 8, 31, 32, 33, 100, 4096])
@pytest.mark.parametrize("seed", [0, 42])
def test_xxh64_vs_reference(n, seed):
    o = require_oracle()
    import numpy as np
    data = np.random.default_rng(n * 13 + seed).integers(0, 256, n).astype(np.uint8).tobytes()
    assert xxh64(data, seed) == o.xxh64(data, seed)


def test_xxh32_streaming_matches_oneshot():
    import numpy as np
    data = np.random.default_rng(5).integers(0, 256, 10_000).astype(np.uint8).tobytes()
    h = XXH32(7)
    for i in range(0, len(data), 333):
        h.update(data[i:i + 333])
    assert h.digest() == xxh32(data, 7)
