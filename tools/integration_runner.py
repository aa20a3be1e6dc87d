#!/usr/bin/env python3
"""Cross-implementation integration runner (one command).

The reference drives producer/consumer matrices through
dev/archery/archery/integration/runner.py; this is that harness for the
native wire surfaces here, with pyarrow (the reference's own C++ stack)
as the peer implementation:

  ipc      random schemas -> native write / pyarrow read AND pyarrow
           write / native read, file + stream framing, none/zstd/lz4
           bodies
  parquet  pyarrow write -> native read (arbitrary nesting); native
           write -> pyarrow read (flat + one-level)
  flight   native gRPC server <-> pyarrow.flight client DoGet/DoPut,
           and the native client against the same server
  csv      native write -> pyarrow read; pyarrow write -> native read

Usage:
  python tools/integration_runner.py [--schemas 12] [--rows 256]
      [--seed 0] [--scenarios ipc,parquet,flight,csv]

Exit code 0 iff every (schema, scenario, direction) cell passes.
Runs CPU-only and in CI time (< 2 min).
"""

import argparse
import io
import os
import sys
import traceback

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402


# ---------------------------------------------------------------------
# random schema / data generation
# ---------------------------------------------------------------------

_PRIMS = [pa.int8(), pa.int16(), pa.int32(), pa.int64(), pa.uint8(),
          pa.uint32(), pa.float32(), pa.float64(), pa.bool_(),
          pa.string(), pa.binary(), pa.date32(), pa.timestamp("us"),
          pa.timestamp("ms"), pa.time64("us"), pa.decimal128(20, 4)]


def _rand_type(rng, depth):
    if depth <= 0 or rng.random() < 0.55:
        return _PRIMS[int(rng.integers(0, len(_PRIMS)))]
    k = int(rng.integers(0, 3))
    if k == 0:
        return pa.list_(_rand_type(rng, depth - 1))
    if k == 1:
        return pa.struct([("a", _rand_type(rng, depth - 1)),
                          ("b", _PRIMS[int(rng.integers(0, len(_PRIMS)))])])
    return pa.map_(pa.string(), _rand_type(rng, depth - 1))


def _rand_value(rng, t):
    if rng.random() < 0.12:
        return None
    if pa.types.is_list(t):
        return [_rand_value(rng, t.value_type)
                for _ in range(int(rng.integers(0, 4)))]
    if pa.types.is_map(t):
        return [(f"k{j}", _rand_value(rng, t.item_type))
                for j in range(int(rng.integers(0, 3)))]
    if pa.types.is_struct(t):
        return {f.name: _rand_value(rng, f.type) for f in t}
    if pa.types.is_boolean(t):
        return bool(rng.integers(0, 2))
    if pa.types.is_integer(t):
        info = np.iinfo(t.to_pandas_dtype())
        return int(rng.integers(max(info.min, -2**53),
                                min(info.max, 2**53)))
    if pa.types.is_floating(t):
        return float(np.round(rng.standard_normal() * 100, 4))
    if pa.types.is_decimal(t):
        from decimal import Decimal

        return Decimal(int(rng.integers(-10**12, 10**12))).scaleb(-t.scale)
    if pa.types.is_date(t):
        return int(rng.integers(0, 30000))
    if pa.types.is_timestamp(t) or pa.types.is_time(t):
        return int(rng.integers(0, 10**12))
    if pa.types.is_binary(t):
        return bytes(rng.integers(0, 256, int(rng.integers(0, 8)),
                                  dtype=np.uint8))
    return "".join(rng.choice(list("abcxyz012"),
                              int(rng.integers(0, 9))))


def random_schema_batch(rng, rows, nested=True):
    ncols = int(rng.integers(2, 6))
    arrays, names = [], []
    for c in range(ncols):
        t = _rand_type(rng, 2 if nested else 0)
        vals = [_rand_value(rng, t) for _ in range(rows)]
        if pa.types.is_date(t):
            arrays.append(pa.array(
                [None if v is None else v for v in vals], pa.int32()
            ).cast(t))
        elif pa.types.is_timestamp(t) or pa.types.is_time(t):
            arrays.append(pa.array(
                [None if v is None else v for v in vals], pa.int64()
            ).cast(t))
        else:
            arrays.append(pa.array(vals, t))
        names.append(f"c{c}")
    return pa.record_batch(arrays, names=names)


def _eq(a: pa.RecordBatch, b: pa.RecordBatch) -> bool:
    if a.schema.names != b.schema.names or a.num_rows != b.num_rows:
        return False
    for name in a.schema.names:
        if a.column(name).to_pylist() != b.column(name).to_pylist():
            return False
    return True


# ---------------------------------------------------------------------
# scenarios: each returns None on pass, an error string on fail
# ---------------------------------------------------------------------

def scenario_ipc(rb: pa.RecordBatch):
    from arrow1_tpu.interop import record_batch_from_arrow
    from arrow1_tpu.io import ipc_native as ipc

    ours = record_batch_from_arrow(rb)
    for fmt in ("stream", "file"):
        for comp in (None, "zstd", "lz4"):
            # produce: native -> consume: pyarrow
            sink = io.BytesIO()
            if fmt == "stream":
                ipc.write_stream(sink, ours, compression=comp)
                back = pa.ipc.open_stream(sink.getvalue()).read_all()
            else:
                ipc.write_file(sink, ours, compression=comp)
                back = pa.ipc.open_file(sink.getvalue()).read_all()
            if not _eq(rb, back.combine_chunks().to_batches()[0]):
                return f"native->pyarrow {fmt}/{comp}"
            # produce: pyarrow -> consume: native
            sink = io.BytesIO()
            opts = pa.ipc.IpcWriteOptions(
                compression=comp if comp != "lz4" else "lz4")
            w = (pa.ipc.new_stream if fmt == "stream"
                 else pa.ipc.new_file)(sink, rb.schema, options=opts)
            w.write_batch(rb)
            w.close()
            if fmt == "stream":
                batches = ipc.read_stream(sink.getvalue())
            else:
                batches = ipc.read_file(sink.getvalue())
            got = batches[0].to_arrow()
            if not _eq(rb, got):
                return f"pyarrow->native {fmt}/{comp}"
    return None


def scenario_ipc_cpp(rb: pa.RecordBatch):
    """The two-way C++ binding (native/src/ipc_{file,write}.cpp) against
    pyarrow, over the batch's flat primitive columns (the pair's scope)."""
    import tempfile

    import pyarrow.compute as pc

    from arrow1_tpu.io.ipc_cpp import (ipc_cpp_available, read_ipc_cpp,
                                       write_ipc_cpp)

    if not ipc_cpp_available():
        return None  # native toolchain absent: vacuous pass, like archery skips
    flat = {}
    dict_cols = set()   # emitted by the C++ writer dictionary-encoded
    for name, col in zip(rb.schema.names, rb.columns):
        t = col.type
        if (pa.types.is_integer(t) or pa.types.is_floating(t)
                or pa.types.is_boolean(t)) and t != pa.float16():
            valid = col.is_valid().to_numpy(zero_copy_only=False)
            fill = False if pa.types.is_boolean(t) else 0
            vals = pc.fill_null(col, fill).to_numpy(zero_copy_only=False)
            flat[name] = (np.ascontiguousarray(vals),
                          None if valid.all() else valid)
        elif pa.types.is_string(t) or pa.types.is_dictionary(t):
            # r5: strings cross the C++ boundary — plain utf8 AND the
            # engine's dictionary form (every other string col rides
            # the dict path to exercise both writers)
            dec = (col.cast(pa.string())
                   if pa.types.is_dictionary(t) else col)
            valid = dec.is_valid().to_numpy(zero_copy_only=False)
            vals = np.array([x if x is not None else ""
                             for x in dec.to_pylist()], object)
            if pa.types.is_dictionary(t) or len(flat) % 2:
                dict_cols.add(name)
            flat[name] = (vals, None if valid.all() else valid)
    if not flat:
        return None
    names = list(flat)
    with tempfile.TemporaryDirectory() as d:
        # produce: C++ -> consume: pyarrow
        p = os.path.join(d, "c.arrow")

        def _as_write_col(n):
            vals = flat[n][0]
            if n in dict_cols:
                uniq = sorted(set(vals))
                lut = {v: i for i, v in enumerate(uniq)}
                idx = np.array([lut[v] for v in vals], np.int32)
                return (idx, uniq)
            return vals

        write_ipc_cpp(p, names, [_as_write_col(n) for n in names],
                      [flat[n][1] for n in names])
        back = pa.ipc.open_file(p).read_all()
        for n in names:
            vals, valid = flat[n]
            bc = back.column(n)
            if pa.types.is_dictionary(bc.type):
                bc = bc.cast(pa.string())
            if vals.dtype == object:
                got = np.array([x if x is not None else ""
                                for x in bc.to_pylist()], object)
            else:
                got = np.asarray(bc.to_numpy(zero_copy_only=False))
            m = valid if valid is not None else np.ones(len(vals), bool)
            if int(back.column(n).null_count) != int((~m).sum()):
                return f"cpp->pyarrow null_count {n}"
            if not np.array_equal(got[m], vals[m]):
                return f"cpp->pyarrow values {n}"
        # produce: pyarrow -> consume: C++
        p2 = os.path.join(d, "p.arrow")
        sub = pa.table({n: (rb.column(rb.schema.names.index(n))
                            .cast(pa.string()).dictionary_encode()
                            if n in dict_cols else
                            rb.column(rb.schema.names.index(n)))
                        for n in names})
        with pa.ipc.new_file(p2, sub.schema) as w:
            w.write_table(sub)
        rnames, batches = read_ipc_cpp(p2)
        if rnames != names:
            return "pyarrow->cpp names"
        for i, n in enumerate(names):
            vals, valid = flat[n]
            got, gvalid = batches[0][i]
            m = valid if valid is not None else np.ones(len(vals), bool)
            if gvalid is not None and not np.array_equal(gvalid, m):
                return f"pyarrow->cpp validity {n}"
            if not np.array_equal(got[m], vals[m]):
                return f"pyarrow->cpp values {n}"
    return None


def scenario_parquet(rb: pa.RecordBatch):
    import pyarrow.parquet as pq

    from arrow1_tpu.interop import record_batch_from_arrow
    from arrow1_tpu.io.parquet_native import (read_parquet_native,
                                              write_parquet_native)

    # pyarrow writes (any nesting, dictionary+snappy defaults) ->
    # native reads
    buf = io.BytesIO()
    pq.write_table(pa.table(rb), buf)
    got = read_parquet_native(buf.getvalue()).to_arrow()
    for name in rb.schema.names:
        if got[name].to_pylist() != rb.column(name).to_pylist():
            return f"pyarrow->native col {name}"
    # native writes (flat/one-level subset) -> pyarrow reads
    flat = all(not pa.types.is_nested(f.type) for f in rb.schema)
    if flat:
        out = io.BytesIO()
        try:
            write_parquet_native(record_batch_from_arrow(rb), out,
                                 compression="zstd")
        except Exception:
            return None  # unsupported type for the writer subset: skip
        back = pq.read_table(io.BytesIO(out.getvalue()))
        for name in rb.schema.names:
            if back[name].to_pylist() != rb.column(name).to_pylist():
                return f"native->pyarrow col {name}"
    return None


def scenario_flight(rb: pa.RecordBatch):
    import pyarrow.flight as fl

    from arrow1_tpu.flight_native import (NativeFlightClient,
                                          serve_tables_native)
    from arrow1_tpu.interop import record_batch_from_arrow
    from arrow1_tpu.table import Table

    ours = record_batch_from_arrow(rb)
    with serve_tables_native({"t": Table([ours])}) as server:
        # pyarrow client DoGet against the native server
        client = fl.connect(server.location)
        got = client.do_get(fl.Ticket(b"t")).read_all()
        if not _eq(rb, got.combine_chunks().to_batches()[0]):
            return "pyarrow DoGet"
        # pyarrow client DoPut -> native DoGet
        desc = fl.FlightDescriptor.for_path("up")
        writer, _ = client.do_put(desc, rb.schema)
        writer.write_batch(rb)
        writer.close()
        got = client.do_get(fl.Ticket(b"up")).read_all()
        if not _eq(rb, got.combine_chunks().to_batches()[0]):
            return "pyarrow DoPut roundtrip"
        # native client against the same server
        with NativeFlightClient(server.location) as nc:
            got2 = nc.do_get(b"t")
            if not _eq(rb, got2.to_arrow().combine_chunks().to_batches()[0]):
                return "native DoGet"
    return None


def scenario_csv(rb: pa.RecordBatch):
    import pyarrow.csv as pacsv

    from arrow1_tpu.csv import read_csv, write_csv
    from arrow1_tpu.interop import record_batch_from_arrow

    # CSV is text-typed: restrict to the lossless column subset
    keep = [f.name for f in rb.schema
            if (pa.types.is_integer(f.type) or pa.types.is_string(f.type))]
    if len(keep) < 2:
        # a lone nullable column writes blank lines for nulls, which
        # csv readers (incl. pyarrow's) skip as empty rows — ambiguous
        # by format, not by implementation
        return None
    import tempfile

    # bare empty = null, quoted "" = empty string (the writer's wire
    # contract) — both readers need the explicit option to see it
    conv = pacsv.ConvertOptions(strings_can_be_null=True,
                                quoted_strings_can_be_null=False)
    from arrow1_tpu.csv import ConvertOptions as NativeConv

    sub = pa.table(rb).select(keep).to_batches()[0]
    with tempfile.NamedTemporaryFile(suffix=".csv") as tf:
        write_csv(record_batch_from_arrow(sub), tf.name)
        back = pacsv.read_csv(tf.name, convert_options=conv)
        ours2 = read_csv(tf.name, convert_options=NativeConv(
            strings_can_be_null=True,
            quoted_strings_can_be_null=False))
    for name in keep:
        # the native writer quotes empty strings so they stay distinct
        # from nulls (bare empty) on the wire
        want = sub.column(name).to_pylist()
        if back[name].to_pylist() != want:
            return f"native->pyarrow col {name}"
        if ours2.column(name).to_pylist() != want:
            return f"native roundtrip col {name}"
    return None


def scenario_orc(rb: pa.RecordBatch):
    try:
        import pyarrow.orc as paorc
    except ImportError:
        return None

    from arrow1_tpu.io.orc_native import read_orc_native

    # liborc writes -> native reads (the reader is the native surface;
    # time64/duration aren't ORC types — drop unsupported columns)
    keep = [f.name for f in rb.schema
            if not (pa.types.is_time(f.type)
                    or pa.types.is_duration(f.type))]
    if not keep:
        return None
    sub = pa.table(rb).select(keep)
    buf = io.BytesIO()
    try:
        paorc.write_table(sub, buf)
    except Exception:
        return None  # liborc writer limitation: nothing to check
    got = read_orc_native(buf.getvalue()).to_arrow()
    for name in keep:
        if got[name].to_pylist() != sub[name].to_pylist():
            return f"liborc->native col {name}"
    return None


SCENARIOS = {"ipc": scenario_ipc, "ipc_cpp": scenario_ipc_cpp,
             "parquet": scenario_parquet,
             "flight": scenario_flight, "csv": scenario_csv,
             "orc": scenario_orc}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--schemas", type=int, default=12)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scenarios",
                default="ipc,ipc_cpp,parquet,flight,csv,orc")
    args = ap.parse_args()

    wanted = [s.strip() for s in args.scenarios.split(",") if s.strip()]
    for s in wanted:
        if s not in SCENARIOS:
            ap.error(f"unknown scenario {s!r}")

    rng = np.random.default_rng(args.seed)
    failures = 0
    for i in range(args.schemas):
        rb = random_schema_batch(rng, args.rows)
        types = ", ".join(str(f.type) for f in rb.schema)
        print(f"schema {i:2d} [{types}]")
        for s in wanted:
            try:
                err = SCENARIOS[s](rb)
            except Exception:
                err = traceback.format_exc(limit=3).strip().splitlines()[-1]
            status = "PASS" if err is None else f"FAIL ({err})"
            if err is not None:
                failures += 1
            print(f"    {s:<8} {status}")
    print(f"\n{'OK' if failures == 0 else 'FAILED'}: "
          f"{args.schemas} schemas x {len(wanted)} scenarios, "
          f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
