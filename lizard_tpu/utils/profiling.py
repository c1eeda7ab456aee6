"""Tracing/profiling hooks (SURVEY.md section 5: the reference exposes
timing via programs/bench.c + util.h clocks; the TPU-native equivalents
are jax.profiler traces for XLA/Pallas timelines plus lightweight host
stage timers).

Usage:
    from lizard_tpu.utils.profiling import trace, stage, report

    with trace("/tmp/tb"):          # XLA/TPU timeline -> TensorBoard
        with stage("decode"):       # host wall-clock stage counter
            ...
    print(report())

Pallas kernels appear as single opaque events in the xplane trace
(measured limitation; see NOTES_ROUND1.md) -- decompose kernel-internal
costs with tools/abench.py ablations instead.
"""

import contextlib
import time
from collections import defaultdict

_STAGES: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler device trace (viewable in TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def stage(name: str):
    """Accumulating host wall-clock timer for a pipeline stage."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _STAGES[name].append(time.perf_counter() - t0)


def annotate(name: str):
    """jax.profiler.TraceAnnotation context: labels host spans inside a
    device trace."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def report(reset: bool = False) -> str:
    """One line per stage: calls, total, mean."""
    lines = []
    for name in sorted(_STAGES):
        ts = _STAGES[name]
        lines.append(f"{name:>20}: n={len(ts):<5d} total={sum(ts):8.3f}s "
                     f"mean={sum(ts) / len(ts) * 1e3:9.3f}ms")
    if reset:
        _STAGES.clear()
    return "\n".join(lines)


def reset() -> None:
    _STAGES.clear()
