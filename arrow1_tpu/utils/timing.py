"""Device timing helpers (tunnel-latency-aware).

The axon TPU tunnel adds ~28 ms per dispatch and its block_until_ready
does not block (kernels/TOOLCHAIN_NOTES.md), so honest timing needs
(a) completion forced via device_get of a result-derived scalar and
(b) measured dispatch overhead subtracted.
"""

from __future__ import annotations

import time
from typing import Callable

__all__ = ["measure_dispatch_overhead", "timed_device"]


def measure_dispatch_overhead(reps: int = 5) -> float:
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(8)
    float(jax.device_get(f(x)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jax.device_get(f(x)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timed_device(fn: Callable, *args, reps: int = 3,
                 overhead: float = None) -> float:
    """Best-of-reps wall time of `fn(*args)` minus dispatch overhead.
    `fn` must return something reducible; completion is forced."""
    import jax
    import jax.numpy as jnp

    g = jax.jit(lambda *a: jnp.sum(
        jnp.asarray(jax.tree_util.tree_leaves(fn(*a))[0]).astype(jnp.float32)))
    float(jax.device_get(g(*args)))
    if overhead is None:
        overhead = measure_dispatch_overhead()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jax.device_get(g(*args)))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - overhead, 1e-9)
