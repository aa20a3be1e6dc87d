"""Fused predicate/projection closures for compaction_v15.compact_fused.

Each closure is a TOP-LEVEL function (jit caches on identity) taking
([R, L] i32 blocks, params_ref) and returning (mask, out_planes). The
flagship closure implements BASELINE config 1's fused filter+project —
  keep rows where f > thresh and v > vthr; emit (key, proj = v*2 + f)
— entirely in-kernel: integer two-word compares for the predicate,
float-float (kernels/dd.py) for the projection, i.e. platform-f64
semantics without ever leaving VMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .dd import (dd_add, dd_from_f32bits, dd_from_i32_pair, dd_gt,
                 dd_scale_pow2)

__all__ = ["flagship_filter_project", "FLAGSHIP_PARAMS"]

FLAGSHIP_PARAMS = 6  # [vthr_lo, vthr_hi, th_hi_bits, th_lo_bits, 0, 0]


def _bcast_i32(block_like, scalar_i32):
    return jnp.full(block_like.shape, scalar_i32, jnp.int32)


def _i64_gt(lo_a, hi_a, lo_b, hi_b):
    """(hi_a, lo_a) > (hi_b, lo_b) as int64 two-word compare: signed
    high words, unsigned low words."""
    ua = jax.lax.shift_right_logical(lo_a, 1)
    ub = jax.lax.shift_right_logical(lo_b, 1)
    lo_gt = (ua > ub) | ((ua == ub) & ((lo_a & 1) > (lo_b & 1)))
    return (hi_a > hi_b) | ((hi_a == hi_b) & lo_gt)


def flagship_filter_project(blocks, params_ref):
    """blocks = (klo, khi, vlo, vhi, f_hi_bits, f_lo_bits).
    params = [vthr_lo, vthr_hi, thresh_hi_bits, thresh_lo_bits, ...].
    mask = (f > thresh) & (v > vthr); out = (klo, khi, proj_hi_bits,
    proj_lo_bits) with proj = v * 2.0 + f in float-float."""
    klo, khi, vlo, vhi, fhb, flb = blocks
    vthr_lo = _bcast_i32(vlo, params_ref[0])
    vthr_hi = _bcast_i32(vhi, params_ref[1])
    th = dd_from_f32bits(_bcast_i32(fhb, params_ref[2]),
                         _bcast_i32(flb, params_ref[3]))
    f = dd_from_f32bits(fhb, flb)
    mask = dd_gt(f, th) & _i64_gt(vlo, vhi, vthr_lo, vthr_hi)
    v2 = dd_scale_pow2(dd_from_i32_pair(vlo, vhi), 2.0)
    ph, plo = dd_add(v2, f)
    return mask, [klo, khi,
                  jax.lax.bitcast_convert_type(ph, jnp.int32),
                  jax.lax.bitcast_convert_type(plo, jnp.int32)]
