"""Profiling and throughput observability.

The reference has no tracing/profiling at all (SURVEY.md §5 — only tqdm
bars). Here: a ``jax.profiler`` trace context (viewable in TensorBoard /
Perfetto) and a throughput meter that the trainers report each epoch.

Enable tracing for a training run with ``MMC_PROFILE_DIR=/path`` — the first
epoch is captured.
"""

from __future__ import annotations

import contextlib
import os
import time

# Per-chip hardware ceilings by jax device_kind — the ONE copy bench.py and
# tools/roofline.py share (MFU denominators, physical-ceiling assertions,
# roofline bounds). bf16 MXU peak FLOP/s and HBM bandwidth bytes/s.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}
PEAK_BYTES = {
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5p": 2765e9,
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,
}


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def profile_dir_from_env() -> str | None:
    return os.environ.get("MMC_PROFILE_DIR") or None


class ThroughputMeter:
    """Sequences/sec accounting across an epoch."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._n = 0
        self._t0 = time.perf_counter()

    def add(self, n_sequences: int) -> None:
        self._n += n_sequences

    @property
    def seq_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._n / dt if dt > 0 else 0.0
