"""Tracing / profiling hooks (SURVEY.md §5: the reference has none beyond
wall-clock RTF prints — this adds jax.profiler traces + phase timers +
audio-sec/s counters as first-class observability).
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulating wall-clock timers per phase (prefill / decode / vocoder)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_ms": round(1000 * v / max(self.counts[k], 1), 3)}
                for k, v in self.totals.items()}

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/vibevoice_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def rtf_counter(audio_samples: int, wall_s: float, sample_rate: int = 24000,
                chips: int = 1) -> Dict[str, float]:
    audio_sec = audio_samples / sample_rate
    return {
        "audio_sec": round(audio_sec, 3),
        "wall_s": round(wall_s, 3),
        "rtf": round(audio_sec / wall_s, 4) if wall_s > 0 else 0.0,
        "audio_sec_per_s_per_chip": round(audio_sec / wall_s / chips, 4) if wall_s > 0 else 0.0,
    }


__all__ = ["PhaseTimer", "device_trace", "rtf_counter"]
