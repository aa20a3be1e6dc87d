"""float-float ("double-double" over f32) arithmetic for Pallas kernels.

On this TPU stack, f64 IS a float-float pair: the XLA x64 rewriting
stores an f64 array as (hi f32, lo f32) with |lo| <= ulp(hi)/2 and
emulates arithmetic on the pairs (the r5_ddsplit probe demonstrates the
representation: hi = f32(x), lo = f32(x - f64(hi)) round-trips exactly
on device). Pallas kernels have no f64 — these helpers implement the
same pair arithmetic in native f32 ops so fused kernels
(compaction_v15.py) can evaluate "f64" predicates and projections
in-VMEM with platform-f64 semantics (~49-bit effective mantissa,
f32 exponent range — the platform's own f64 limits, not new ones).

Classic error-free transformations (Knuth two-sum, Dekker):
T.J. Dekker, "A floating-point technique for extending the available
precision" (1971) — public-domain numerical folklore.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dd_two_sum", "dd_add", "dd_scale_pow2", "dd_from_i32_pair",
           "dd_gt", "dd_from_f32bits", "np_dd_split"]


def dd_two_sum(a, b):
    """Error-free a + b -> (s, err) with s = fl(a+b), a+b = s+err."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _dd_norm(hi, lo):
    s = hi + lo
    return s, lo - (s - hi)


def dd_add(x, y):
    """(hi, lo) + (hi, lo) — the standard double-double add (Knuth
    two-sum on the highs, low-order terms folded, renormalized)."""
    xh, xl = x
    yh, yl = y
    s, e = dd_two_sum(xh, yh)
    e = e + xl + yl
    return _dd_norm(s, e)


def dd_scale_pow2(x, p: float):
    """x * 2^k (exact: both components scale)."""
    xh, xl = x
    return xh * p, xl * p


def dd_from_i32_pair(lo_i32, hi_i32):
    """(lo word, hi word) of an int64 -> float-float value
    hi*2^32 + u32(lo). Exact for |value| < 2^48-ish; beyond that it
    rounds to DD precision exactly like the platform's own i64->f64."""
    a = hi_i32.astype(jnp.float32) * jnp.float32(4294967296.0)
    top = jax.lax.shift_right_logical(lo_i32, 16)
    bot = lo_i32 & 0xFFFF
    b_hi = top.astype(jnp.float32) * jnp.float32(65536.0)
    b_lo = bot.astype(jnp.float32)
    bh, bl = dd_two_sum(b_hi, b_lo)
    s, e = dd_two_sum(a, bh)
    return _dd_norm(s, e + bl)


def dd_from_f32bits(hi_bits_i32, lo_bits_i32):
    """Bitcast two i32 planes back to the (hi, lo) f32 pair."""
    return (jax.lax.bitcast_convert_type(hi_bits_i32, jnp.float32),
            jax.lax.bitcast_convert_type(lo_bits_i32, jnp.float32))


def dd_gt(x, y):
    """x > y for CANONICAL pairs (|lo| <= ulp(hi)/2): lexicographic."""
    xh, xl = x
    yh, yl = y
    return (xh > yh) | ((xh == yh) & (xl > yl))


def np_dd_split(x_f64: np.ndarray):
    """Host-side ingest split of true f64 data into the platform pair:
    hi = nearest f32, lo = f32 of the remainder — the same conversion
    jnp.asarray performs when moving f64 data onto this device. Returns
    (hi f32, lo f32). Values outside f32 exponent range degrade exactly
    as the platform itself degrades them."""
    hi = x_f64.astype(np.float32)
    lo = (x_f64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo
