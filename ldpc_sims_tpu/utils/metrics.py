"""Structured metrics: JSONL logging + simple phase timers.

The reference's observability is bare ``print`` lines
(``ofdm/ofdm_nn.py:108``, ``evaluate_snr.py:83``) and result pickles.
Here every metric event is one JSON line (append-only, crash-safe,
greppable) and hot phases can be timed with :class:`PhaseTimer`;
``jax.profiler`` tracing hooks in for device-level profiles
(SURVEY.md §5.1/§5.5).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any

import jax

__all__ = [
    "MetricsLogger",
    "PhaseTimer",
    "profile_trace",
    "enable_compilation_cache",
    "stable_fold_in",
]


def stable_fold_in(key, *parts) -> Any:
    """``jax.random.fold_in`` keyed on a process-stable hash of ``parts``.

    Python's ``hash()`` is PYTHONHASHSEED-randomized for str-bearing
    values, so deriving PRNG keys from it breaks cross-process
    determinism (SURVEY §5.2). This folds a crc32 of the repr of the
    parts instead — stable across processes and machines for the
    numeric/str tags the drivers use.
    """
    import zlib

    tag = "|".join(repr(p) for p in parts)
    return jax.random.fold_in(key, zlib.crc32(tag.encode()) & 0x7FFFFFFF)


def enable_compilation_cache(path: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache.

    The Pallas decode kernel costs minutes of Mosaic compile per
    (code, iterations, flags) configuration on TPU (BENCH_r01 measured
    238 s for the (1944,972) bench step); the cache makes every
    configuration a one-time cost per machine instead of per process.
    Called by ``bench.py`` and the CLI entry point.
    """
    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "ldpc_sims_tpu", "jax_cache",
        ),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # anything that takes ≥5 s to compile is worth persisting (the
    # decode kernels take minutes; tiny host jits stay out of the cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    return path


class MetricsLogger:
    """Append-only JSONL metrics sink (pass ``path=None`` for stdout)."""

    def __init__(self, path: str | None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, event: str, **fields: Any) -> None:
        rec = {"event": event, "t": time.time(), **fields}
        line = json.dumps(rec, default=float)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        else:
            print(line, flush=True)


class PhaseTimer:
    """Accumulating wall-clock timers per named phase."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": v, "count": self.counts[k]}
            for k, v in self.totals.items()
        }


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Wrap a region in a jax.profiler trace (no-op if log_dir is None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
