"""Round-4 multichip evidence: distributed q1/q3 at scale on a virtual
8-device mesh, with row-exact parity vs the single-chip engine, an
overflow->replan cycle, and shuffle-volume accounting.

Round-3 lesson (VERDICT.md Missing #1): the 8M-row leg blew the
driver's wall-clock budget (rc=124). This version is budgeted:

- default 2M rows for ALL legs as of r5 (VERDICT r4 Weak #7: r4 ran
  q3/salted at 500K with ~200 s of unused budget — the guard still
  protects the driver's wall clock);
- one untimed warmup + ONE timed run per query, reported as
  {warmup_s (includes compile), run_s} — no "compile_s_approx"
  subtraction (r3's was negative, a meaningless split);
- a wall-clock guard (A1T_DRYRUN_BUDGET_S, default 300) checked
  before each leg: remaining legs are SKIPPED and marked, never
  timed out.

Writes benchmarks/r4/multichip_report.json (the driver clobbers
MULTICHIP_r0N.json with its own rc record, so the detailed report
lives here) and prints a one-line parity summary LAST so it survives
in the driver's output tail.

Usage: python benchmarks/r4/multichip_r4.py [n_rows] [q3_rows]
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "multichip_report.json")

D = 8
T0 = time.monotonic()
BUDGET_S = float(os.environ.get("A1T_DRYRUN_BUDGET_S", 300))


def _over_budget(need_s: float = 0.0) -> bool:
    return time.monotonic() - T0 > BUDGET_S - need_s


def _shuffle_rows_moved(keys: np.ndarray, n_dev: int) -> np.ndarray:
    """Rows each shard SENDS in a hash-partition shuffle (the all_to_all
    volume denominator for scaling efficiency)."""
    from arrow1_tpu.parallel.shuffle import FNV_MIX

    h = (keys.astype(np.uint64) * np.uint64(FNV_MIX))
    dest = (h >> np.uint64(32)).astype(np.int64) % n_dev
    shard = np.arange(len(keys)) * n_dev // len(keys)  # row-block layout
    moved = np.zeros(n_dev, np.int64)
    for s in range(n_dev):
        m = shard == s
        moved[s] = int((dest[m] != s).sum())
    return moved


def main(n: int = 2_000_000, q3_rows: int = 500_000,
         salted_rows: int = 500_000):
    import pyarrow as pa

    import arrow1_tpu as a1t
    from arrow1_tpu.errors import Invalid
    from arrow1_tpu.exec.dist_compiled import DistPipelineBuilder
    from arrow1_tpu.parallel.mesh import make_mesh

    report = {"n_rows": n, "devices": D, "rows_per_shard": n // D,
              "budget_s": BUDGET_S, "skipped_legs": []}
    summary = {"at_scale_rows": n, "q1_parity": None, "q3_parity": None,
               "replan": None, "salted_join_parity": None}
    mesh = make_mesh(D)
    rng = np.random.default_rng(42)

    # ---- lineitem-shaped data; skewed join key (zipf-ish) ------------
    G = 2_000  # group cardinality for q1
    ship = rng.integers(0, 5_000, n).astype(np.int64)
    flag = rng.integers(0, G, n).astype(np.int64)
    qty = rng.integers(1, 50, n).astype(np.int64)
    price = rng.standard_normal(n)
    # skew: 10% of probe rows hit 4 hot keys (the compiled pipeline
    # sizes caps for this without salting; the hot case goes through
    # the salted eager dist_join below)
    n_build = 250_000
    okey = rng.integers(0, n_build, n).astype(np.int64)
    hot = rng.random(n) < 0.10
    okey[hot] = rng.integers(0, 4, int(hot.sum()))
    lineitem = a1t.record_batch(pa.record_batch({
        "l_orderkey": pa.array(okey),
        "l_shipdate": pa.array(ship),
        "l_flag": pa.array(flag),
        "l_qty": pa.array(qty),
        "l_price": pa.array(price),
    }))
    orders = a1t.record_batch(pa.record_batch({
        "o_orderkey": pa.array(np.arange(n_build, dtype=np.int64)),
        "o_seg": pa.array(rng.integers(0, 5, n_build).astype(np.int64)),
    }))

    # ================= q1: filter -> group_by -> sort ==================
    q1 = (DistPipelineBuilder(mesh)
          .filter(a1t.field("l_shipdate") <= 2_500)
          .group_by(["l_flag"], [("l_qty", "sum"), ("l_price", "sum"),
                                 ("l_qty", "count")],
                    # cap is per (src,dst) pair: a src shard's ~n/(2D)
                    # live rows spread over D dests with 2000 uniform
                    # groups -> pair ~ n/(2 D^2); 4x margin
                    shuffle_cap=max(n // 32, 4096))
          .sort([("l_flag", "ascending")])
          .compile())
    t0 = time.perf_counter()
    r1 = q1(lineitem)          # untimed warmup (includes compile)
    t_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    r1 = q1(lineitem)          # the one timed run
    t_run = time.perf_counter() - t0
    report["q1"] = {"warmup_s": round(t_warm, 2),
                    "run_s": round(t_run, 2),
                    "out_rows": r1.num_rows}

    # parity vs single-chip eager
    sel = (a1t.field("l_shipdate") <= 2_500).execute(lineitem)
    hot_e = a1t.compute.filter(lineitem, sel)
    agg_e = a1t.group_by(hot_e, ["l_flag"],
                         [("l_qty", "sum"), ("l_price", "sum"),
                          ("l_qty", "count")])
    order = np.argsort(np.asarray(agg_e.column("l_flag").data),
                       kind="stable")
    ok = r1.num_rows == agg_e.num_rows
    for cn in ["l_flag", "l_qty_sum", "l_qty_count"]:
        ok = ok and np.array_equal(
            np.asarray(r1.column(cn).data),
            np.asarray(agg_e.column(cn).data)[order])
    ok = ok and np.allclose(
        np.asarray(r1.column("l_price_sum").data),
        np.asarray(agg_e.column("l_price_sum").data)[order],
        rtol=1e-9, atol=1e-9)
    report["q1"]["parity_vs_single_chip"] = bool(ok)
    summary["q1_parity"] = bool(ok)
    assert ok, "q1 distributed != single-chip"

    # combine-before-shuffle: each shard ships <= its DISTINCT group
    # count as partial rows (exec/dist_compiled._op_group_by_partial),
    # not its raw rows
    live_flags = flag[ship <= 2_500]
    shard_of = np.arange(len(live_flags)) * D // len(live_flags)
    moved = np.array([
        len(np.unique(live_flags[shard_of == s])) for s in range(D)])
    raw_moved = _shuffle_rows_moved(live_flags, D)
    report["q1"]["partial_rows_sent_per_shard"] = moved.tolist()
    report["q1"]["row_shuffle_equivalent_per_shard"] = raw_moved.tolist()
    report["q1"]["shuffle_volume_reduction_x"] = round(
        float(raw_moved.mean()) / max(float(moved.mean()), 1), 1)
    summary["q1_shuffle_reduction_x"] = (
        report["q1"]["shuffle_volume_reduction_x"])

    # ============ q3: filter -> join -> group_by -> sort ===============
    # q3's padded shuffles are CPU-heavy on the virtual mesh; a smaller
    # row count (structure and shardings are scale-invariant)
    if _over_budget(need_s=60 + q3_rows // 15_000):
        report["skipped_legs"].append("q3")
    else:
        li3 = lineitem.slice(0, q3_rows) if q3_rows < n else lineitem
        n3 = li3.num_rows
        ship3, okey3 = ship[:n3], okey[:n3]
        report["q3_rows"] = n3
        q3 = (DistPipelineBuilder(mesh)
              .filter(a1t.field("l_shipdate") > 1_000)
              .join(orders, keys=["l_orderkey"],
                    right_keys=["o_orderkey"],
                    join_type="inner", fanout=2,
                    # per-pair worst: a hot key carries ~0.075 of a src
                    # shard's rows to one dest (+1/D uniform) ->
                    # ~0.2*n/D; the build side needs ~n_build/D^2
                    shuffle_cap=max(n3 // (2 * D), n_build // D))
              .group_by(["l_orderkey"], [("l_qty", "sum"),
                                         ("l_price", "sum")],
                        # hot groups land whole on one pair: ~2.5% of n
                        # per hot key, up to 2 on a pair, plus uniform
                        shuffle_cap=max(n3 // 8, 4096))
              .sort([("l_qty_sum", "descending")])
              .limit(10)
              .compile())
        t0 = time.perf_counter()
        r3 = q3(li3)           # untimed warmup (includes compile)
        t_warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        r3 = q3(li3)           # the one timed run
        t_run = time.perf_counter() - t0
        report["q3"] = {"warmup_s": round(t_warm, 2),
                        "run_s": round(t_run, 2),
                        "out_rows": r3.num_rows}

        sel = (a1t.field("l_shipdate") > 1_000).execute(li3)
        li = a1t.compute.filter(li3, sel)
        j_e = a1t.join(li, orders, keys=["l_orderkey"],
                       right_keys=["o_orderkey"])
        a_e = a1t.group_by(j_e, ["l_orderkey"], [("l_qty", "sum"),
                                                 ("l_price", "sum")])
        top = np.sort(np.asarray(a_e.column("l_qty_sum").data))[::-1][:10]
        ok = r3.num_rows == 10
        ok = ok and np.array_equal(
            np.asarray(r3.column("l_qty_sum").data), top)
        report["q3"]["parity_vs_single_chip"] = bool(ok)
        summary["q3_parity"] = bool(ok)
        assert ok, "q3 distributed != single-chip"

        moved = _shuffle_rows_moved(okey3[ship3 > 1_000], D)
        report["q3"]["join_shuffle_rows_sent_per_shard"] = moved.tolist()
        report["q3"]["join_shuffle_mb_per_shard"] = round(
            float(moved.mean()) * 5 * 8 / 1e6, 2)

    # ============ overflow -> replan (capacity doubling) ===============
    # group_by with a deliberately-too-small shuffle cap: G=2000 groups
    # all hash-route, worst shard receives > cap -> on-device overflow
    # flag -> raise -> replan with doubled cap succeeds.
    if _over_budget(need_s=60):
        report["skipped_legs"].append("overflow_replan")
    else:
        caps_tried = []
        cap = 256
        replan_in = lineitem.slice(0, min(n, 200_000))
        while True:
            caps_tried.append(cap)
            qq = (DistPipelineBuilder(mesh)
                  .group_by(["l_flag"], [("l_qty", "sum")],
                            shuffle_cap=cap)
                  .compile())
            try:
                rr = qq(replan_in)
                break
            except Invalid:
                cap *= 4
                if cap > replan_in.num_rows:
                    raise
        report["overflow_replan"] = {
            "caps_tried": caps_tried, "final_cap": cap,
            "out_rows": rr.num_rows, "exercised": len(caps_tried) > 1}
        summary["replan"] = len(caps_tried) > 1
        assert len(caps_tried) > 1, "overflow path was not exercised"
        assert rr.num_rows == G

    # ============ skew salting (eager dist_join at scale) ==============
    if _over_budget(need_s=40 + salted_rows // 12_000):
        report["skipped_legs"].append("skew_salted_join")
    else:
        from arrow1_tpu.parallel import dist_join

        sub = lineitem.slice(0, min(n, salted_rows))
        t0 = time.perf_counter()
        js = dist_join(sub, orders, keys=["l_orderkey"],
                       right_keys=["o_orderkey"], mesh=mesh)
        t_salt = time.perf_counter() - t0
        je = a1t.join(sub, orders, keys=["l_orderkey"],
                      right_keys=["o_orderkey"])
        ok = js.num_rows == je.num_rows and np.array_equal(
            np.sort(np.asarray(js.column("l_qty").data)),
            np.sort(np.asarray(je.column("l_qty").data)))
        report["skew_salted_join"] = {
            "rows": sub.num_rows, "hot_key_fraction": 0.10,
            "parity": bool(ok), "warmup_s": round(t_salt, 2)}
        summary["salted_join_parity"] = bool(ok)
        assert ok, "salted dist_join != single-chip join"

    report["total_s"] = round(time.monotonic() - T0, 1)
    summary["total_s"] = report["total_s"]
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    # one-line summary LAST: the driver's artifact keeps only the tail
    print("AT_SCALE_SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    _n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    main(_n,
         q3_rows=int(sys.argv[2]) if len(sys.argv) > 2 else _n,
         salted_rows=int(sys.argv[3]) if len(sys.argv) > 3 else _n)
