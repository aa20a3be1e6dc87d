"""Mosaic feature-probe matrix — run on a TPU backend to check which
kernel building blocks the current toolchain lowers.

    python -m arrow1_tpu.kernels.tpu_probes

Each probe is tiny and independent; results update the support table in
TOOLCHAIN_NOTES.md. Keep probes FIRST when resuming Pallas work — the
failure modes here cost minutes each to rediscover through the remote
compiler.
"""

from __future__ import annotations

import numpy as np


def run_probes():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, L, T = 8, 128, 1024
    x1 = jnp.arange(4 * T, dtype=jnp.int32)
    x2 = jnp.arange(4 * R * L, dtype=jnp.int32).reshape(4 * R, L)
    results = {}

    def probe(name, fn):
        try:
            jax.device_get(fn())
            results[name] = "OK"
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            results[name] = f"FAIL: {msg}"
        print(f"{name:<28} {results[name]}", flush=True)

    # 1. blocked specs, 1-D
    def k_blocked1(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2

    probe("blocked-1d", lambda: pl.pallas_call(
        k_blocked1, grid=(4,),
        in_specs=[pl.BlockSpec((T,), lambda i: (i,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * T,), jnp.int32))(x1))

    # 2. blocked specs, 2-D
    probe("blocked-2d", lambda: pl.pallas_call(
        k_blocked1, grid=(4,),
        in_specs=[pl.BlockSpec((R, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * R, L), jnp.int32))(x2))

    # 3. manual-DMA 2-D with matmul
    def k_dma(x_hbm, o_hbm, vin, vout, sin, sout):
        i = pl.program_id(0)
        base = pl.multiple_of(i * R, R)
        pltpu.make_async_copy(x_hbm.at[pl.ds(base, R), :], vin, sin).start()
        pltpu.make_async_copy(x_hbm.at[pl.ds(base, R), :], vin, sin).wait()
        m = (vin[:] % 2).astype(jnp.float32)
        tri = (jax.lax.broadcasted_iota(jnp.int32, (L, L), 0) <=
               jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
               ).astype(jnp.float32)
        pref = jnp.dot(m, tri, preferred_element_type=jnp.float32)
        vout[:] = pref.astype(jnp.int32)
        pltpu.make_async_copy(vout, o_hbm.at[pl.ds(base, R), :],
                              sout).start()
        pltpu.make_async_copy(vout, o_hbm.at[pl.ds(base, R), :],
                              sout).wait()

    probe("manual-dma-matmul", lambda: pl.pallas_call(
        k_dma, grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((4 * R, L), jnp.int32),
        scratch_shapes=[pltpu.VMEM((R, L), jnp.int32),
                        pltpu.VMEM((R, L), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(x2))

    # 4. cumsum lowering
    def k_cumsum(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:])

    probe("cumsum-1d", lambda: pl.pallas_call(
        k_cumsum, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * T,), jnp.int32))(x1))

    # 5. SMEM output
    def k_smem(x_ref, o_ref):
        o_ref[0] = jnp.sum(x_ref[:])

    probe("smem-output", lambda: pl.pallas_call(
        k_smem, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32))(x1))

    # 6. DMA inside pl.when
    def k_when(x_hbm, o_hbm, v, sem):
        i = pl.program_id(0)
        base = pl.multiple_of(i * R, R)
        pltpu.make_async_copy(x_hbm.at[pl.ds(base, R), :], v, sem).start()
        pltpu.make_async_copy(x_hbm.at[pl.ds(base, R), :], v, sem).wait()

        @pl.when(i % 2 == 0)
        def _():
            pltpu.make_async_copy(v, o_hbm.at[pl.ds(base, R), :],
                                  sem).start()
            pltpu.make_async_copy(v, o_hbm.at[pl.ds(base, R), :],
                                  sem).wait()

    probe("dma-in-when", lambda: pl.pallas_call(
        k_when, grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((4 * R, L), jnp.int32),
        scratch_shapes=[pltpu.VMEM((R, L), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(x2))

    # 7. f64 bitcasts (x64 rewriter)
    f64 = jnp.asarray(np.array([1.5, -2.5], dtype=np.float64))
    i64 = jnp.asarray(np.array([1, -2], dtype=np.int64))
    probe("bitcast-i64-i32x2", lambda: jax.jit(
        lambda: jax.lax.bitcast_convert_type(i64, jnp.int32))())
    probe("bitcast-f64-i64", lambda: jax.jit(
        lambda: jax.lax.bitcast_convert_type(f64, jnp.int64))())

    return results


if __name__ == "__main__":
    run_probes()
