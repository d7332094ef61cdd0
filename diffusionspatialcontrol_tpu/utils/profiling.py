"""Observability: phase timing, step metrics, watchdog, device memory.

Upgrades the reference's only tracing (a wall-clock + VRAM print after each
generation, source/app.py:1239-1247, and its 360 s assert-based watchdog,
model_k_diffusion.py:1094-1095) to structured per-phase metrics and an
optional jax.profiler trace.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Collects wall-clock per named phase; renders the reference-style
    perf summary line."""

    def __init__(self):
        self.phases: Dict[str, float] = {}
        self._start = time.perf_counter()

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    @property
    def total(self) -> float:
        return time.perf_counter() - self._start

    def summary(self, **extra) -> str:
        rec = {
            "total_s": round(self.total, 4),
            **{f"{k}_s": round(v, 4) for k, v in self.phases.items()},
            **extra,
        }
        mem = device_memory_stats()
        if mem:
            rec.update(mem)
        return json.dumps(rec)


def device_memory_stats() -> Optional[Dict[str, float]]:
    """HBM usage of device 0 (the reference prints vram via
    torch.cuda.mem_get_info, app.py:1239-1247)."""
    try:
        stats = jax.devices()[0].memory_stats()
        if not stats:
            return None
        return {
            "hbm_in_use_mb": round(stats.get("bytes_in_use", 0) / 2**20, 1),
            "hbm_limit_mb": round(stats.get("bytes_limit", 0) / 2**20, 1),
        }
    except Exception:
        return None


class Watchdog:
    """Per-generation timeout (reference: 360 s assert inside model_fn,
    model_k_diffusion.py:1094-1095; timeout at app.py:261). Checked at host
    phase boundaries — the jitted loop itself cannot exceed it since its
    runtime is bounded by steps x step-time."""

    def __init__(self, timeout_s: float = 360.0):
        self.timeout_s = timeout_s
        self.start = time.time()

    def check(self):
        if self.timeout_s > 0 and time.time() - self.start > self.timeout_s:
            raise TimeoutError(
                f"inference exceeded {self.timeout_s}s watchdog"
            )


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """Optional jax.profiler trace around a generation."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
