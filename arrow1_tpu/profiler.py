"""Per-kernel roofline profiler for the eager compute path.

Reference: the tracing/metrics subsystem (SURVEY.md §5; the reference's
util/tracing_internal.h spans + benchmark counters). On TPU the number
that matters for a memory-bound columnar engine is each kernel's achieved
HBM bandwidth as a fraction of the device roofline — this module records
exactly that for every `call_function` dispatch inside the context:

    with KernelProfiler() as prof:
        ac.add(a, b)
        ac.filter(batch, mask)
    prof.report()        # per-kernel: calls, ms, MB moved, roofline %

Bytes are accounted from the pytree leaves of the input/output datums
(device-array nbytes — the engine's columns are pytrees). Wall time
blocks on the result, so profiled runs serialize dispatch (same caveat
as the reference's benchmark counters).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

__all__ = ["KernelProfiler", "KernelRecord", "hbm_peak_bytes_per_sec"]

# Published peak HBM bandwidth per chip (public spec sheets).
HBM_PEAK = {
    "TPU v5 lite": 819e9,   # v5e
    "TPU v5e": 819e9,
    "TPU v5p": 2765e9,
    "TPU v4": 1228e9,
    "TPU v6e": 1640e9,
}
_CPU_NOMINAL = 50e9


def hbm_peak_bytes_per_sec(device=None) -> float:
    """Roofline denominator for a device (nominal 50 GB/s for CPU)."""
    import jax

    dev = device if device is not None else jax.devices()[0]
    kind = str(getattr(dev, "device_kind", "cpu"))
    return next((v for k, v in HBM_PEAK.items() if k in kind),
                _CPU_NOMINAL)


def _tree_nbytes(x) -> int:
    import jax

    total = 0
    for leaf in jax.tree_util.tree_leaves(x):
        nb = getattr(leaf, "nbytes", None)
        if nb is not None:
            total += int(nb)
    return total


@dataclass
class KernelRecord:
    name: str
    wall_s: float
    bytes_in: int
    bytes_out: int

    @property
    def bytes_moved(self) -> int:
        return self.bytes_in + self.bytes_out

    def roofline_frac(self, peak: float) -> float:
        if self.wall_s <= 0:
            return 0.0
        return (self.bytes_moved / self.wall_s) / peak


@dataclass
class _Agg:
    calls: int = 0
    wall_s: float = 0.0
    bytes_moved: int = 0
    best_frac: float = 0.0


_active = threading.local()


def _current() -> Optional["KernelProfiler"]:
    return getattr(_active, "profiler", None)


class KernelProfiler:
    """Context manager collecting one KernelRecord per eager dispatch."""

    def __init__(self, device=None):
        self.records: List[KernelRecord] = []
        self._device = device
        self._peak: Optional[float] = None
        self._prev = None

    @property
    def peak(self) -> float:
        if self._peak is None:
            self._peak = hbm_peak_bytes_per_sec(self._device)
        return self._peak

    def __enter__(self):
        self._prev = _current()
        _active.profiler = self
        return self

    def __exit__(self, *exc):
        _active.profiler = self._prev
        return False

    # called from registry.call_function
    def _measure(self, name: str, runner, datums):
        import jax

        bytes_in = sum(_tree_nbytes(d) for d in datums)
        jax.block_until_ready(
            [leaf for d in datums
             for leaf in jax.tree_util.tree_leaves(d)
             if hasattr(leaf, "block_until_ready")])
        t0 = time.perf_counter()
        out = runner()
        jax.block_until_ready(
            [leaf for leaf in jax.tree_util.tree_leaves(out)
             if hasattr(leaf, "block_until_ready")])
        wall = time.perf_counter() - t0
        self.records.append(KernelRecord(
            name, wall, bytes_in, _tree_nbytes(out)))
        return out

    # -- reporting --
    def by_kernel(self) -> Dict[str, _Agg]:
        out: Dict[str, _Agg] = {}
        for r in self.records:
            agg = out.setdefault(r.name, _Agg())
            agg.calls += 1
            agg.wall_s += r.wall_s
            agg.bytes_moved += r.bytes_moved
            agg.best_frac = max(agg.best_frac,
                                r.roofline_frac(self.peak))
        return out

    def summary(self) -> List[dict]:
        rows = []
        for name, a in sorted(self.by_kernel().items(),
                              key=lambda kv: -kv[1].wall_s):
            rows.append({
                "kernel": name,
                "calls": a.calls,
                "total_ms": round(a.wall_s * 1e3, 3),
                "mb_moved": round(a.bytes_moved / 1e6, 3),
                "avg_gbps": round(
                    a.bytes_moved / a.wall_s / 1e9, 2) if a.wall_s else 0.0,
                "best_roofline_frac": round(a.best_frac, 4),
            })
        return rows

    def report(self) -> str:
        lines = [f"{'kernel':<24}{'calls':>6}{'ms':>10}{'MB':>10}"
                 f"{'GB/s':>8}{'roof%':>7}"]
        for row in self.summary():
            lines.append(
                f"{row['kernel']:<24}{row['calls']:>6}"
                f"{row['total_ms']:>10.3f}{row['mb_moved']:>10.3f}"
                f"{row['avg_gbps']:>8.2f}"
                f"{100 * row['best_roofline_frac']:>6.1f}%")
        return "\n".join(lines)
