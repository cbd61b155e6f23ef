"""Observability: throughput counters and profiler hooks.

The reference has no built-in tracing (SURVEY.md §5) — performance was
measured externally.  The TPU runtime instead exposes structured counters
(bytes/docs/tokens per stage) and optional jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class Counters:
    bytes_in: int = 0
    docs_in: int = 0
    tokens_out: int = 0
    fallback_docs: int = 0
    chunked_docs: int = 0
    invalid_docs: int = 0
    stage_seconds: dict = field(default_factory=lambda: defaultdict(float))
    batches: int = 0
    # cross-batch unit cache (dedup cumulative over the corpus)
    cache_units: int = 0  # distinct units interned over the run
    dispatched_rows: int = 0  # device rows actually dispatched (cache misses)

    def as_dict(self) -> dict:
        total = sum(self.stage_seconds.values())
        return {
            "bytes_in": self.bytes_in,
            "docs_in": self.docs_in,
            "tokens_out": self.tokens_out,
            "fallback_docs": self.fallback_docs,
            "chunked_docs": self.chunked_docs,
            "invalid_docs": self.invalid_docs,
            "batches": self.batches,
            "cache_units": self.cache_units,
            "dispatched_rows": self.dispatched_rows,
            "stage_seconds": dict(self.stage_seconds),
            "bytes_per_second": self.bytes_in / total if total > 0 else 0.0,
        }

    def to_json(self) -> str:
        return json.dumps(self.as_dict())


_GLOBAL = Counters()


def global_counters() -> Counters:
    return _GLOBAL


@contextlib.contextmanager
def stage(name: str, counters: Counters | None = None):
    c = counters or _GLOBAL
    t0 = time.perf_counter()
    try:
        yield c
    finally:
        c.stage_seconds[name] += time.perf_counter() - t0


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
