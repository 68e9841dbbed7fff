"""Profiling / observability helpers.

The reference has no profiler hooks (SURVEY.md §5.1 — the only
introspection is the loss history). Here separation runs are single XLA
programs, so observability means device traces and compiled-program
stats rather than per-line Python timing.
"""

import contextlib
import time
from typing import Callable, Optional

import jax

__all__ = ["trace", "timed", "compiled_stats"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` device trace (view with TensorBoard/XProf).

    >>> with trace("/tmp/bss-trace"):
    ...     iva(spectrogram, n_iter=100)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, warmup: int = 1, repeat: int = 5, **kwargs):
    """Wall-clock a jitted callable with dispatch+compile excluded.

    Returns ``(seconds_per_call, last_result)``; blocks on device results.
    """
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)

    t0 = time.perf_counter()
    for _ in range(repeat):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    return (time.perf_counter() - t0) / repeat, result


def compiled_stats(fn: Callable, *args, **kwargs) -> Optional[dict]:
    """FLOP / memory estimates of the compiled program for ``fn(*args)``.

    Returns ``{"flops", "bytes_accessed", "peak_bytes"}`` where the
    backend provides a cost analysis, else None.
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        memory = compiled.memory_analysis()
    except Exception:
        return None
    if isinstance(cost, list):  # some backends return a singleton list
        cost = cost[0] if cost else {}
    out = {
        "flops": cost.get("flops") if hasattr(cost, "get") else None,
        "bytes_accessed": cost.get("bytes accessed") if hasattr(cost, "get") else None,
    }
    try:
        out["peak_bytes"] = memory.temp_size_in_bytes + memory.output_size_in_bytes
    except Exception:
        out["peak_bytes"] = None
    return out
