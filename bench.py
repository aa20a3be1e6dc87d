"""Flagship benchmark: fused filter+project throughput (BASELINE config 1).

Prints ONE JSON line:
  {"metric": ..., "value": rows/sec, "unit": "rows/s", "vs_baseline": frac}

vs_baseline = achieved_bytes_per_sec / (0.80 * HBM_peak) — 1.0 means the
operator meets the BASELINE target of 80% of the HBM roofline on this chip
(the reference publishes no absolute numbers — BASELINE.md — so the
roofline fraction IS the contract).

Methodology: the axon TPU tunnel adds ~28 ms fixed latency per dispatch
(measured at startup and subtracted). The step is jitted once (kept
compile-light — the remote-compile service is slow for large HLO) and
timed over several dispatches; the checksum consumes the full compacted
output so nothing dead-codes.

Traffic accounting per row (roofline denominator):
  read  key int64 (8) + v int64 (8) + f float64 (8)       = 24 B
  write compacted key+proj at selectivity s (16 * s)
"""

import json
import os
import sys
import time

import numpy as np

# peak table lives with the roofline profiler (arrow1_tpu/profiler.py)


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # The tunneled-TPU plugin shadows JAX_PLATFORMS; honor an explicit
        # CPU pin so smoke runs never touch (a possibly wedged) tunnel.
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: a cold flagship kernel costs minutes of
    # remote compile — queue runs warm the cache so the driver's
    # end-of-round invocation compiles in seconds
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    import arrow1_tpu  # noqa: F401  (x64 on)
    from arrow1_tpu.ops.padded import filter_padded

    N = int(os.environ.get("A1T_BENCH_ROWS", 10_000_000))
    REPS = int(os.environ.get("A1T_BENCH_ITERS", 5))
    # selectivity grid knob (reference harness shape: selectivity x size
    # grids, vector_selection_benchmark.cc:157) — the v-threshold moves
    # so `v > vthr` keeps `sel` of the symmetric int range
    SEL = float(os.environ.get("A1T_BENCH_SEL", 0.5))

    from arrow1_tpu.profiler import hbm_peak_bytes_per_sec

    peak = hbm_peak_bytes_per_sec(jax.devices()[0])

    from arrow1_tpu.kernels.compaction_v4 import best_rows, compact_v4

    # Explicit champion table (replaces the r2/r3 A/B-JSON auto-select;
    # the full A/B record lives in BENCH_NOTES.md). r5 measured probes
    # (results_tpu_r5.json): w4 kernel 1.654 ms (projection pushdown,
    # 4 planes), int8 routing dot exact at 2.758 vs bf16's 2.956 (w6);
    # fused path (prepass + w4) 2.659 ms end-to-end. The champion is
    # the fused v14 path with the int8 dot; v15 (in-kernel
    # predicate+projection) takes over once its real-TPU probe lands
    # (r5d queue) — select with A1T_BENCH_KERNEL=v15[:split2].
    #   r4 record: v14:256:152 bf16 unfused 3.67 ms / 0.1332
    # v15 on-device (r5, 2026-08-21): the INNER=24 flagship run
    # measured 5.046 G rows/s = vs_baseline 0.2465 at sel 0.5002
    # (1.98 ms/iter; rel_err 8.7e-14 on the INNER=8 exactness probe).
    # i8diag: the int8 routing dot is bit-identical to bf16 at full
    # 10M (the one NaN checksum earlier was transient). The split2
    # half-stack variant is FASTER (1.74 ms) but measured rel_err 2e-4
    # on device — off the champion seat until that is understood.
    CHAMPION = "v15"
    choice = os.environ.get("A1T_BENCH_KERNEL", "auto")
    if choice == "auto":
        choice = CHAMPION

    compact_fn = compact_v4
    forced_rows = None

    def _v7(T):
        import functools

        from arrow1_tpu.kernels.compaction_v7 import compact_v7

        return functools.partial(compact_v7, t_tiles=T)

    def _v12(R, band):
        from arrow1_tpu.kernels.compaction_v12 import compact_v12

        def fn(mask, cols, rows=R, out_limit=None, planes_meta=None):
            return compact_v12(mask, cols, rows=rows, band=band,
                               out_limit=out_limit,
                               planes_meta=planes_meta)

        return fn

    def _v14(R, band, dot="bf16"):
        from arrow1_tpu.kernels.compaction_v14 import compact_v14

        def fn(mask, cols, rows=R, out_limit=None, planes_meta=None):
            return compact_v14(mask, cols, rows=rows, band=band,
                               out_limit=out_limit,
                               planes_meta=planes_meta, dot=dot)

        return fn

    if choice.startswith("v15"):
        forced_rows = 256          # the compact_fused tile height
    elif choice.startswith("v14"):
        parts = choice.split(":")
        forced_rows = int(parts[1]) if len(parts) > 1 else 256
        if len(parts) > 2 and parts[2] not in ("i8", "bf16"):
            v14_band = int(parts[2])
        else:
            # band sized to the selectivity: each step emits ~R*sel
            # output rows (+margin for binomial variance and the
            # carry row). At the default SEL=0.5 this is exactly the
            # measured champion config (256,152).
            v14_band = min(forced_rows + 9,
                           int(forced_rows * SEL) + 24)
        v14_dot = "i8" if parts[-1] == "i8" else "bf16"
        compact_fn = _v14(forced_rows, v14_band, v14_dot)
    elif choice.startswith("v12"):
        parts = choice.split(":")
        forced_rows = int(parts[1]) if len(parts) > 1 else 256
        v12_band = int(parts[2]) if len(parts) > 2 else 0
        compact_fn = _v12(forced_rows, v12_band)
    elif choice.startswith("v7"):
        _v7t = int(choice.split(":", 1)[1]) if ":" in choice else 8

        def compact_fn(mask, cols, rows, out_limit=None,
                       planes_meta=None, _inner=_v7(_v7t)):
            return _inner(mask, cols, rows=rows, out_limit=out_limit,
                          planes_meta=planes_meta)

    R = forced_rows or best_rows(N)
    # v6/v7/v8 need n divisible by T*R*128; 16 tiles covers all
    TILE = R * 128 * 16
    if N < TILE:
        # a big-R champion (v14:256 -> 512K-row tiles) would floor a
        # small smoke run to N=0 — fall back to size-fitted tiling
        R = best_rows(N)
        TILE = R * 128 * 16
    N = N // TILE * TILE
    assert N > 0, f"A1T_BENCH_ROWS too small (< {TILE})"
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 20, N).astype(np.int64))
    v = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, N).astype(np.int64))
    # f64 carried as int64 bit views: movement kernels are bit-exact and
    # bits->f64 bitcast works on-device (the reverse does not;
    # kernels/TOOLCHAIN_NOTES.md)
    f_bits = jnp.asarray(rng.standard_normal(N).view(np.int64))
    use_pallas = jax.default_backend() == "tpu"

    # INNER amortizes the ~28 ms tunnel dispatch latency; at 8 the
    # per-iteration extraction carries +-0.3 ms of overhead noise
    # (r5_fusedA measured 2.66 then 3.01 across runs) — 24 cuts it 3x
    INNER = int(os.environ.get("A1T_BENCH_INNER", 24))

    # v uniform over [-2^30, 2^30): with the f > thresh factor at 0.5,
    # P(v > vthr) = 2*SEL gives combined selectivity SEL (SEL <= 0.5)
    vthr = jnp.int64(int((1.0 - 2.0 * min(2.0 * SEL, 1.0))
                         * (1 << 30)))

    # static survivor bound: the expected count + generous slack
    # (binomial sd at 10M/0.25 is ~1.4K; 5% + 16K never trips — a
    # post-run assert guards it). Truncating the kernel outputs to
    # this bound keeps recombine+consumer HBM traffic O(sel*N).
    LIM = min(N, int(N * SEL * 1.05) + 16384)
    LIM = (LIM + 127) // 128 * 128

    # plane-native storage mode (default on the Pallas path): 64-bit
    # columns live as split lo/hi i32 word planes — produced ONCE at
    # ingest, exactly like Arrow picks its buffer layout at ingest —
    # so the kernel reads its input layout directly and the per-call
    # _to_words materialization pass (an extra read+write of every
    # column) disappears from the hot loop. A1T_BENCH_PLANES=0 times
    # the i64-array storage mode instead.
    PLANES = (use_pallas and not choice.startswith("v15")
              and os.environ.get("A1T_BENCH_PLANES", "1") == "1")
    if PLANES:
        from arrow1_tpu.kernels.compaction_v4 import _to_words

        plane_arrs = []
        pm = []
        for c in (key, v, f_bits):
            ws, meta = _to_words(c)
            pm.append((len(ws), meta))
            plane_arrs.extend(jnp.asarray(w) for w in ws)
        planes_meta = tuple(pm)
        plane_arrs = tuple(plane_arrs)

    # v15 (compact_fused): predicate AND projection evaluated INSIDE
    # the kernel (kernels/compaction_v15.py) — no prepass round-trip at
    # all. Inputs are the engine's plane-native storage for this path:
    # i64 columns as lo/hi i32 words, the f64 column as its PLATFORM
    # representation (float-float f32 pair, split once at ingest).
    V15 = use_pallas and choice.startswith("v15")
    if V15:
        from arrow1_tpu.kernels.compaction_v15 import compact_fused
        from arrow1_tpu.kernels.fused_ops import flagship_filter_project
        from arrow1_tpu.kernels.dd import np_dd_split

        v15_split = 2 if choice.endswith("split2") else 1
        f_np = np.asarray(f_bits).view(np.float64)
        fh, fl = np_dd_split(f_np)
        key_np = np.asarray(key)
        v_np = np.asarray(v)
        v15_planes = tuple(jnp.asarray(x) for x in (
            (key_np & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
            .copy(),
            (key_np >> 32).astype(np.int32),
            (v_np & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
            .copy(),
            (v_np >> 32).astype(np.int32),
            fh.view(np.int32).copy(), fl.view(np.int32).copy()))
        v15_band = min(R + 9, int(R * SEL) + 24)
        vthr_i = int(jax.device_get(vthr))

        def one_v15(thresh, arrs):
            th = thresh.astype(jnp.float32)
            tl = (thresh - th.astype(jnp.float64)).astype(jnp.float32)
            params = jnp.stack([
                jnp.int32(int(np.uint32(vthr_i & 0xFFFFFFFF)
                              .astype(np.int32))),
                jnp.int32(int(np.uint32((vthr_i >> 32) & 0xFFFFFFFF)
                              .astype(np.int32))),
                jax.lax.bitcast_convert_type(th, jnp.int32),
                jax.lax.bitcast_convert_type(tl, jnp.int32),
                jnp.int32(0), jnp.int32(0)])
            (oklo, okhi, oph, opl), count, ovf = compact_fused(
                arrs, flagship_filter_project, 4, params=params,
                rows=R, band=v15_band, out_limit=LIM, split=v15_split)
            okey = ((okhi.astype(jnp.int64) << jnp.int64(32))
                    | (oklo.astype(jnp.int64) & jnp.int64(0xFFFFFFFF)))
            proj = (jax.lax.bitcast_convert_type(oph, jnp.float32)
                    .astype(jnp.float64)
                    + jax.lax.bitcast_convert_type(opl, jnp.float32)
                    .astype(jnp.float64))
            return (count.astype(jnp.float64)
                    + ovf.astype(jnp.float64) * 1e30  # canary: never fires
                    + jnp.sum(okey[:1024]).astype(jnp.float64)
                    + jnp.sum(proj)
                    + okey[count - 1].astype(jnp.float64))

        @jax.jit
        def step_v15(thresh, arrs):
            def body(i, acc):
                return acc + one_v15(
                    thresh + i.astype(jnp.float64) * 1e-12, arrs)

            return jax.lax.fori_loop(0, INNER, body, jnp.float64(0.0))

    # fused filter+project (the r5 flagship path, TPU only): the
    # projection proj = v*2.0 + f is computed BEFORE the filter and the
    # movement kernel compacts only (key i64, proj) = 4 word planes
    # instead of 6 — projection pushdown below the filter is profitable
    # exactly because it narrows the row, and movement (the pack
    # butterfly scales with plane count) is the scarce resource.
    # Platform f64 is a float-float (f32 hi/lo) pair under the x64
    # rewriting, so proj splits into its two f32 planes EXACTLY via
    # hi = f32(x), lo = f32(x - f64(hi)) and recombines exactly by
    # promote+add (probed: benchmarks/r5 r5_ddsplit — exact within the
    # platform-f64 exponent range; real-f64 backends keep the plain
    # path). Reference analogue: Gandiva fuses filter+project into one
    # pass (cpp/src/gandiva/filter.h:66 + projector.h:41).
    FUSED = (PLANES and os.environ.get("A1T_BENCH_FUSED", "1") == "1"
             and not choice.startswith("v12"))
    # (V15 below supersedes both: in-kernel predicate+projection)
    if FUSED:
        fused_meta = ((2, ("64", jnp.int64)),
                      (1, ("f32", jnp.float32)),
                      (1, ("f32", jnp.float32)))

    def one_fused(thresh, arrs):
        klo, khi, vlo, vhi, flo, fhi = arrs
        v64 = ((vhi.astype(jnp.int64) << jnp.int64(32))
               | (vlo.astype(jnp.int64) & jnp.int64(0xFFFFFFFF)))
        f64b = ((fhi.astype(jnp.int64) << jnp.int64(32))
                | (flo.astype(jnp.int64) & jnp.int64(0xFFFFFFFF)))
        f = jax.lax.bitcast_convert_type(f64b, jnp.float64)
        mask = (f > thresh) & (v64 > vthr)
        proj = v64.astype(jnp.float64) * 2.0 + f
        phi = proj.astype(jnp.float32)
        plo = (proj - phi.astype(jnp.float64)).astype(jnp.float32)
        phw = jax.lax.bitcast_convert_type(phi, jnp.int32)
        plw = jax.lax.bitcast_convert_type(plo, jnp.int32)
        (out_key, out_ph, out_pl), count = compact_fn(
            mask, (klo, khi, phw, plw), rows=R, out_limit=LIM,
            planes_meta=fused_meta)
        out_proj = (out_ph.astype(jnp.float64)
                    + out_pl.astype(jnp.float64))
        return (count.astype(jnp.float64)
                + jnp.sum(out_key[:1024]).astype(jnp.float64)
                + jnp.sum(out_proj)
                + out_key[count - 1].astype(jnp.float64))

    def _mask_from(thresh, key, v, f_bits):
        f = jax.lax.bitcast_convert_type(f_bits, jnp.float64)
        return (f > thresh) & (v > vthr)

    def one_planes(thresh, arrs):
        klo, khi, vlo, vhi, flo, fhi = arrs
        v64 = ((vhi.astype(jnp.int64) << jnp.int64(32))
               | (vlo.astype(jnp.int64) & jnp.int64(0xFFFFFFFF)))
        f64b = ((fhi.astype(jnp.int64) << jnp.int64(32))
                | (flo.astype(jnp.int64) & jnp.int64(0xFFFFFFFF)))
        mask = _mask_from(thresh, None, v64, f64b)
        (out_key, out_v, out_fb), count = compact_fn(
            mask, arrs, rows=R, out_limit=LIM, planes_meta=planes_meta)
        return _consume(out_key, out_v, out_fb, count)

    def one(thresh, key, v, f_bits):
        # threshold is a traced arg (prevents constant folding across calls)
        mask = _mask_from(thresh, key, v, f_bits)
        if use_pallas:
            (out_key, out_v, out_fb), count = compact_fn(
                mask, (key, v, f_bits), rows=R, out_limit=LIM)
        else:
            idx, count = filter_padded(mask)
            out_key, out_v, out_fb = key[idx], v[idx], f_bits[idx]
        return _consume(out_key, out_v, out_fb, count)

    def _consume(out_key, out_v, out_fb, count):
        out_f = jax.lax.bitcast_convert_type(out_fb, jnp.float64)
        proj = out_v.astype(jnp.float64) * 2.0 + out_f
        # consumer: the PROJECTION must be fully computed (a sampled
        # consumer lets XLA dead-code the f64 arithmetic and the metric
        # stops measuring "project"), so proj rides a full reduction —
        # XLA fuses it into the reduce without an extra HBM write,
        # which is the projection's honest cost on this stack. out_key
        # is already fully materialized by the kernel, so a slice
        # sample + count-indexed pick suffice there.
        return (count.astype(jnp.float64)
                + jnp.sum(out_key[:1024]).astype(jnp.float64)
                + jnp.sum(proj)
                + out_key[count - 1].astype(jnp.float64))

    @jax.jit
    def step(thresh, key, v, f_bits):
        # INNER kernel executions per dispatch: the tunnel's ~28 ms
        # dispatch latency would otherwise swamp a ~ms kernel. The
        # threshold is perturbed per iteration (selectivity unchanged to
        # ~1e-12) so no iteration is loop-invariant.
        def body(i, acc):
            return acc + one(thresh + i.astype(jnp.float64) * 1e-12,
                             key, v, f_bits)

        return jax.lax.fori_loop(0, INNER, body, jnp.float64(0.0))

    @jax.jit
    def step_planes(thresh, arrs):
        def body(i, acc):
            return acc + one_planes(
                thresh + i.astype(jnp.float64) * 1e-12, arrs)

        return jax.lax.fori_loop(0, INNER, body, jnp.float64(0.0))

    @jax.jit
    def step_fused(thresh, arrs):
        def body(i, acc):
            return acc + one_fused(
                thresh + i.astype(jnp.float64) * 1e-12, arrs)

        return jax.lax.fori_loop(0, INNER, body, jnp.float64(0.0))

    # dispatch overhead
    tiny = jax.jit(lambda x: x + 1)
    x8 = jnp.zeros(8)
    float(jax.device_get(tiny(x8)[0]))
    overhead = min(
        _t(lambda: float(jax.device_get(tiny(x8)[0]))) for _ in range(5))

    z = jnp.float64(0.0)
    if V15:
        run = lambda: float(jax.device_get(step_v15(z, v15_planes)))
    elif FUSED:
        run = lambda: float(jax.device_get(step_fused(z, plane_arrs)))
    elif PLANES:
        run = lambda: float(jax.device_get(step_planes(z, plane_arrs)))
    else:
        run = lambda: float(jax.device_get(step(z, key, v, f_bits)))
    run()  # compile+warm
    times = [_t(run) for _ in range(REPS)]
    per_iter = max(min(times) - overhead, 1e-9) / INNER

    # the roofline denominator uses the MEASURED selectivity (the old
    # hardcoded 0.5 overstated it — the compound predicate
    # (f > 0) & (v > 0) actually keeps 0.25 — inflating vs_baseline)
    f_all = jax.lax.bitcast_convert_type(f_bits, jnp.float64)
    sel = float(jax.device_get(jnp.mean(
        ((f_all > z) & (v > vthr)).astype(jnp.float32))))
    cnt_exact = int(jax.device_get(jnp.sum(
        ((f_all > z) & (v > vthr)).astype(jnp.int32))))
    assert cnt_exact <= LIM, (cnt_exact, LIM)  # out_limit never clips
    rows_per_sec = N / per_iter
    bytes_per_row = 24 + 16 * sel
    achieved_bw = rows_per_sec * bytes_per_row
    target = 0.80 * peak
    print(json.dumps({
        "metric": "filter_project_rows_per_sec",
        "value": round(rows_per_sec, 1),
        "unit": "rows/s",
        "selectivity": round(sel, 4),
        "vs_baseline": round(achieved_bw / target, 4),
        "planes": bool(PLANES or V15),
        "fused": bool(FUSED or V15),
        "kernel": choice,
    }))


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _run_with_watchdog():
    """The TPU tunnel can stall for minutes; guarantee ONE JSON line by
    running the measurement in a subprocess under a deadline and emitting
    a zero-valued record on timeout (honest failure > silent hang)."""
    import subprocess

    deadline = int(os.environ.get("A1T_BENCH_TIMEOUT", 480))
    t_end = time.monotonic() + deadline
    env = dict(os.environ, A1T_BENCH_CHILD="1")
    pinned_cpu = env.get("JAX_PLATFORMS", "").strip().lower() == "cpu"

    def probe_ok(budget):
        """The wedged-tunnel check: a 16-element sum must finish fast."""
        if pinned_cpu:
            return True
        try:
            p = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(jax.device_get(jnp.sum(jnp.arange(16))))"],
                env=os.environ, timeout=min(90, budget),
                capture_output=True, text=True)
            return p.returncode == 0
        except subprocess.TimeoutExpired:
            return False

    attempt = 0
    while time.monotonic() < t_end - 30:
        attempt += 1
        if not probe_ok(t_end - time.monotonic()):
            sys.stderr.write(f"bench: tunnel probe {attempt} wedged; "
                             "retrying\n")
            time.sleep(min(120, max(0, t_end - time.monotonic() - 30)))
            continue
        budget = t_end - time.monotonic()
        if budget < 30:
            break
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=budget, capture_output=True, text=True)
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    print(line)
                    return
            sys.stderr.write(proc.stderr[-500:] if proc.stderr else "")
        except subprocess.TimeoutExpired:
            sys.stderr.write("bench attempt timed out (TPU tunnel stall)\n")
        # a failed real attempt burns the budget fast; loop re-probes
    sys.stderr.write(f"bench gave up after {deadline}s (TPU tunnel stall)\n")
    print(json.dumps({
        "metric": "filter_project_rows_per_sec", "value": 0.0,
        "unit": "rows/s", "vs_baseline": 0.0}))


if __name__ == "__main__":
    if os.environ.get("A1T_BENCH_CHILD") == "1":
        main()
    else:
        _run_with_watchdog()
