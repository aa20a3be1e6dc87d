"""Two-level MXU grouped aggregation: factored one-hot segment sums.

Supersedes kernels/segsum.py's single-level design for the hot group-by
path. The reference's grouped aggregate is a serial scatter loop
(cpp/src/arrow/compute/kernels/hash_aggregate.cc:522-590); segsum v1
re-expressed it as a one-hot matmul but built the full [TILE, G] one-hot
with VPU compares — G compare/select ops per row, which measured as the
bottleneck (61 ms at 10M rows / G=1024; BENCH_NOTES.md).

v2 factors the one-hot through the group id's base-128 digits:

    gid = hi * 128 + lo
    onehot[t, g] == B[t, hi(g)] * A[t, lo(g)]

so only the two SKINNY factors are built by the VPU:

    A[t, l]  = (gid[t] % 128 == l)          # [TILE, 128]
    B[t, h]  = (gid[t] // 128 == h)         # [TILE, G/128]

(128 + G/128 ops per row instead of G), and the [G/128, 128] group
accumulator comes out of ONE MXU contraction per value plane:

    acc2d[h, l] += sum_t B[t, h] * (A[t, l] * plane[t])

Exactness discipline (TOOLCHAIN_NOTES.md: default MXU precision
truncates f32 operands to bf16): values are split into 8-bit planes
(exact in bf16), each per-tile plane dot sums <= 255 * TILE < 2^24
(exact in the f32 accumulator), and cross-tile accumulation is 64-bit
via (hi, lo) u32 pairs with explicit carry. Sums are reconstructed mod
2^64 outside the kernel — two's-complement-exact for any int64 data.

Group count capacity: MXU MACs scale as TILE * G * planes, so the
kernel is compute-optimal up to G ~ 128K (measured grid in
benchmarks/r2); larger G rides the sort-based path (ops/hash.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ColPlanes", "segment_sums_mxu", "plan_planes",
           "segment_sums_oracle", "TILE2", "MAX_G"]

TILE2 = 1024
MAX_G = 1 << 17  # beyond this the sort path wins (MACs ~ TILE*G*planes)

DP = dict(preferred_element_type=jnp.float32)
_DN0 = (((0,), (0,)), ((), ()))  # contract dim0 x dim0


class ColPlanes(NamedTuple):
    """One aggregated value column, pre-biased to unsigned.

    words:   tuple of i32[n] — little-endian 32-bit words of
             (value - bias) as u64 (1 word if nplanes <= 4)
    live:    bool[n] or None — valid-value mask (None = all valid)
    nplanes: number of 8-bit planes that cover (vmax - bias);
             0 = count-only column (no words needed)
    """

    words: Tuple[jnp.ndarray, ...]
    live: Optional[jnp.ndarray]
    nplanes: int


def plan_planes(vmin: int, vmax: int) -> Tuple[int, int]:
    """(bias, nplanes) so value-bias spans nplanes 8-bit planes."""
    bias = int(vmin)
    spread = int(vmax) - bias
    nplanes = max((spread.bit_length() + 7) // 8, 1) if spread else 1
    return bias, min(nplanes, 8)


def _build_kernel(G: int, spec: Tuple[Tuple[int, bool], ...], tiles: int,
                  tot: int):
    GH = G // 128

    def kernel(gid_ref, *refs):
        # refs order: per col: [live?] + words..., then out, acc, sem
        out = refs[-3]
        acc = refs[-2]
        sem = refs[-1]
        ins = refs[:-3]

        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = jnp.zeros((tot, GH, 128), jnp.int32)

        gid = gid_ref[:]                               # [TILE] i32
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE2, 128), 1)
        A = (lanes == (gid & 127)[:, None]).astype(jnp.float32)
        his = jax.lax.broadcasted_iota(jnp.int32, (TILE2, GH), 1)
        # pad rows carry gid == G: hi == GH matches no column -> zero row
        B = (his == (gid >> 7)[:, None]).astype(jnp.float32)

        def accum_u64(slot, d):
            """64-bit accumulate d (f32 dot result, < 2^24) into
            (lo, hi) i32 planes with explicit u32 carry."""
            d_u = jax.lax.bitcast_convert_type(
                d.astype(jnp.int32), jnp.uint32)
            lo_u = jax.lax.bitcast_convert_type(acc[slot], jnp.uint32)
            new_u = lo_u + d_u
            carry = (new_u < d_u).astype(jnp.int32)
            acc[slot] = jax.lax.bitcast_convert_type(new_u, jnp.int32)
            acc[slot + 1] = acc[slot + 1] + carry

        # occurrence counts (<= n < 2^31: plain i32 accumulate)
        occ_d = jax.lax.dot_general(B, A, _DN0, **DP)  # [GH, 128]
        acc[0] = acc[0] + occ_d.astype(jnp.int32)

        slot = 1
        ri = 0
        for nplanes, has_live in spec:
            if has_live:
                live = ins[ri][:]                       # [TILE] i32
                ri += 1
                Av = A * live.astype(jnp.float32)[:, None]
                cnt_d = jax.lax.dot_general(B, Av, _DN0, **DP)
                acc[slot] = acc[slot] + cnt_d.astype(jnp.int32)
                slot += 1
            else:
                Av = A
            if nplanes:
                w0 = ins[ri][:]
                ri += 1
                w1 = ins[ri][:] if nplanes > 4 else None
                if w1 is not None:
                    ri += 1
                w0u = jax.lax.bitcast_convert_type(w0, jnp.uint32)
                w1u = (jax.lax.bitcast_convert_type(w1, jnp.uint32)
                       if w1 is not None else None)
                for p in range(nplanes):
                    src = w0u if p < 4 else w1u
                    # Mosaic has no u32->f32 cast; bytes fit i32 exactly
                    chunk = ((src >> jnp.uint32(8 * (p % 4)))
                             & jnp.uint32(0xFF)).astype(
                                 jnp.int32).astype(jnp.float32)
                    Ap = Av * chunk[:, None]
                    d = jax.lax.dot_general(B, Ap, _DN0, **DP)
                    accum_u64(slot, d)
                    slot += 2

        @pl.when(pl.program_id(0) == tiles - 1)
        def _():
            cp = pltpu.make_async_copy(acc, out, sem)
            cp.start()
            cp.wait()

    return kernel


@functools.lru_cache(maxsize=64)
def _jitted(n: int, G: int, spec: Tuple[Tuple[int, bool], ...],
            interpret: bool):
    tiles = n // TILE2
    tot = 1 + sum((1 if has_live else 0) + 2 * np_ for np_, has_live in spec)
    kernel = _build_kernel(G, spec, tiles, tot)
    n_in = 1 + sum((1 if has_live else 0) + (0 if not np_ else
                                             (1 if np_ <= 4 else 2))
                   for np_, has_live in spec)

    def run(gid, *flat):
        with jax.enable_x64(False):
            out = pl.pallas_call(
                kernel,
                grid=(tiles,),
                in_specs=[pl.BlockSpec((TILE2,), lambda i: (i,),
                                       memory_space=pltpu.VMEM)] * n_in,
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct((tot, G // 128, 128),
                                               jnp.int32),
                scratch_shapes=[
                    pltpu.VMEM((tot, G // 128, 128), jnp.int32),
                    pltpu.SemaphoreType.DMA,
                ],
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True,
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(gid, *flat)
        return out

    # Return the raw fn alongside the jitted one: calling a jitted fn
    # inside an outer trace (e.g. fori_loop) trips a jax-0.9 closed_call
    # lowering-cache bug; tracers route to the raw fn instead.
    return run, jax.jit(run)


def segment_sums_mxu(gid: jnp.ndarray, cols: Sequence[ColPlanes], G: int,
                     interpret: bool = False):
    """Grouped occurrence/valid counts + exact 64-bit sums on the MXU.

    gid: i32[n], values in [0, G]; G marks dead/pad rows (they count
    nowhere). G must be a multiple of 128, <= MAX_G. n is padded to
    TILE2 internally (pad rows get gid=G).

    Returns (occ i64[G], per col: (cnt i64[G], sum_u64[G] or None)).
    Sums are of the BIASED values mod 2^64; add cnt * bias (mod 2^64)
    to recover true sums (see plan_planes).
    """
    assert G % 128 == 0 and 0 < G <= MAX_G, G
    n = gid.shape[0]
    pad = (-n) % TILE2
    gid = gid.astype(jnp.int32)
    if pad:
        gid = jnp.concatenate([gid, jnp.full(pad, G, jnp.int32)])
    spec = []
    flat = []
    for c in cols:
        has_live = c.live is not None
        spec.append((int(c.nplanes), has_live))
        if has_live:
            lv = c.live.astype(jnp.int32)
            if pad:
                lv = jnp.concatenate([lv, jnp.zeros(pad, jnp.int32)])
            flat.append(lv)
        nw = 0 if not c.nplanes else (1 if c.nplanes <= 4 else 2)
        for w in c.words[:nw]:
            w = w.astype(jnp.int32)
            if pad:
                w = jnp.concatenate([w, jnp.zeros(pad, jnp.int32)])
            flat.append(w)
    raw, jitted = _jitted(n + pad, G, tuple(spec), interpret)
    tracing = isinstance(gid, jax.core.Tracer) or any(
        isinstance(f, jax.core.Tracer) for f in flat)
    out = (raw if tracing else jitted)(gid, *flat)

    def u64(plane):
        return plane.reshape(-1).astype(jnp.uint32).astype(jnp.uint64)

    occ = u64(out[0]).astype(jnp.int64)
    slot = 1
    results = []
    for np_, has_live in spec:
        if has_live:
            cnt = u64(out[slot]).astype(jnp.int64)
            slot += 1
        else:
            cnt = occ
        if np_:
            total = jnp.zeros(G, jnp.uint64)
            for p in range(np_):
                lo = u64(out[slot])
                hi = u64(out[slot + 1])
                slot += 2
                total = total + (((hi << jnp.uint64(32)) | lo)
                                 << jnp.uint64(8 * p))
            results.append((cnt, total))
        else:
            results.append((cnt, None))
    return occ, results


def segment_sums_oracle(gid, cols: Sequence[ColPlanes], G: int):
    """XLA scatter oracle with identical contract (parity tests)."""
    n = gid.shape[0]
    in_range = (gid >= 0) & (gid < G)
    safe = jnp.where(in_range, gid, 0)
    occ = jnp.zeros(G, jnp.int64).at[safe].add(
        in_range.astype(jnp.int64), mode="drop")
    results = []
    for c in cols:
        live = (jnp.ones(n, bool) if c.live is None
                else c.live.astype(bool)) & in_range
        cnt = jnp.zeros(G, jnp.int64).at[safe].add(
            live.astype(jnp.int64), mode="drop")
        if c.nplanes:
            w0 = c.words[0].astype(jnp.uint32).astype(jnp.uint64)
            v = w0
            if len(c.words) > 1 and c.nplanes > 4:
                w1 = c.words[1].astype(jnp.uint32).astype(jnp.uint64)
                v = w0 | (w1 << jnp.uint64(32))
            mask = (jnp.uint64(1) << jnp.uint64(8 * c.nplanes)) - \
                jnp.uint64(1) if c.nplanes < 8 else jnp.uint64(0xFFFFFFFFFFFFFFFF)
            v = v & mask
            v = jnp.where(live, v, jnp.uint64(0))
            s = jnp.zeros(G, jnp.uint64).at[safe].add(v, mode="drop")
            results.append((cnt, s))
        else:
            results.append((cnt, None))
    return occ, results
