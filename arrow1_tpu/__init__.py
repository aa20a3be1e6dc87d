"""arrow1_tpu — a TPU-native vectorized columnar query-execution engine.

Brand-new design with the capabilities of Apache Arrow's C++ compute layer
(reference: /root/reference cpp/src/arrow/compute), built TPU-first on
JAX/XLA/Pallas: columns are fixed-width device arrays with bool validity
masks, strings are dictionary-encoded at ingest, kernels are jitted XLA
graphs or Pallas kernels, and distribution is `shard_map` + ICI collectives
over a `jax.sharding.Mesh` instead of RPC.

Layer map (mirrors SURVEY.md §1, re-homed for TPU):
  dtypes/column/table      <- Arrow type system + ArrayData/RecordBatch/Table
  ops/* + registry          <- compute kernel registry (compute/registry.cc)
  expr                      <- compute/exec/expression.{h,cc}
  exec/*                    <- ExecPlan/ExecNode skeleton + streaming driver
  parallel/*                <- Flight-as-shuffle -> mesh collectives
  io/*                      <- IPC/CSV/Parquet host ingest
  kernels/*                 <- Pallas TPU kernels (hash/radix/compaction)
"""

import jax

# int64/float64 columns are first-class in the reference engine; enable
# 64-bit mode globally (TPU executes f64 via software emulation; the hot
# benchmark paths are bandwidth-bound so this costs little, and parity with
# pyarrow demands exact 64-bit semantics).
jax.config.update("jax_enable_x64", True)

from . import dtypes  # noqa: E402
from .dtypes import (  # noqa: E402,F401
    DataType, Field, Schema, schema,
    null, bool_, int8, int16, int32, int64,
    uint8, uint16, uint32, uint64,
    float16, float32, float64,
    string, large_string, binary,
    date32, date64, timestamp, time32, time64, duration,
    decimal128, list_, fixed_size_list, struct, dictionary,
)
from .column import Column, Dictionary, column, nulls  # noqa: E402,F401
from .table import RecordBatch, Table, record_batch, table, concat_batches  # noqa: E402,F401
from .config import ExecContext, default_context  # noqa: E402,F401
from .datum import Datum, Scalar, scalar  # noqa: E402,F401
from .registry import call_function, function_registry, list_functions  # noqa: E402,F401
from . import compute  # noqa: E402,F401
from .datum import as_datum  # noqa: E402,F401
from .ops.groupby import group_by  # noqa: E402,F401
from .ops.join import join  # noqa: E402,F401
from .expr import Expression, call, field, literal  # noqa: E402,F401
from .table import ChunkedColumn, concat_columns  # noqa: E402,F401
from .column import (ListColumn, StructColumn,  # noqa: E402,F401
                     UnionColumn, fixed_size_list_column)
from .validate import validate_batch, validate_column  # noqa: E402,F401

# pyarrow-shaped top-level conveniences
from .dtypes import map_  # noqa: E402,F401
array = column          # pyarrow.array -> Column
concat_arrays = concat_columns


def chunked_array(chunks):
    """pyarrow.chunked_array shape: list of array-likes -> ChunkedColumn."""
    return ChunkedColumn([column(c) for c in chunks])


def concat_tables(tables):
    """pyarrow.concat_tables shape: same-schema Tables -> one Table."""
    from .table import Table

    out = []
    for t in tables:
        out.extend(t.batches)
    return Table(out)


def unify_schemas(schemas):
    """First-wins field unification (reference: UnifySchemas type.cc)."""
    from . import dtypes as _dt

    fields = {}
    for s in schemas:
        for f in s.fields:
            if f.name not in fields:
                fields[f.name] = f
            elif fields[f.name].type != f.type:
                raise ValueError(
                    f"unify_schemas: conflicting types for {f.name!r}: "
                    f"{fields[f.name].type!r} vs {f.type!r}")
    return _dt.Schema(tuple(fields.values()))


def total_allocated_bytes() -> int:
    """Live device-memory estimate (reference: default_memory_pool()
    ->bytes_allocated); backed by PJRT's per-device stats."""
    from .runtime import device_memory_stats

    stats = device_memory_stats()
    return sum(int(s.get("bytes_in_use", 0)) for s in stats.values())         if isinstance(stats, dict) else 0


# subpackages/modules re-exported for discoverability (imported lazily by
# users as arrow1_tpu.io / .dataset / .flight / ... to avoid pulling heavy
# deps at import)
from . import io  # noqa: E402,F401
from . import dataset  # noqa: E402,F401
from . import acero  # noqa: E402,F401
from . import fs  # noqa: E402,F401
from . import gandiva  # noqa: E402,F401
from . import tensor  # noqa: E402,F401
from . import cancel  # noqa: E402,F401
from . import runtime  # noqa: E402,F401
from . import cdata  # noqa: E402,F401
from . import builders  # noqa: E402,F401
from . import memory  # noqa: E402,F401
from . import profiler  # noqa: E402,F401
from . import thread_pool  # noqa: E402,F401
from .query import Query, query  # noqa: E402,F401

__version__ = "0.1.0"
