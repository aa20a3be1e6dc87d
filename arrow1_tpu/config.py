"""Engine configuration (reference model: per-call option structs + explicit
context, no globals — cpp/src/arrow/compute/exec.h:58 ExecContext and the
FunctionOptions hierarchy, SURVEY.md §5 "Config / flag system").

Environment variables honored (reference analogues):
- ``A1T_TARGET_BATCH_ROWS``: streaming batch target, default 2^21 rows
  (reference: kDefaultExecChunksize 64Ki at exec.h:50 — TPU tiles are far
  larger; HBM-resident batches want millions of rows to amortize dispatch).
- ``A1T_DEFAULT_DEVICE``: jax device to place ingested tables on.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax

__all__ = ["ExecContext", "default_context", "TARGET_BATCH_ROWS"]

TARGET_BATCH_ROWS = int(os.environ.get("A1T_TARGET_BATCH_ROWS", 1 << 21))

# Row-count alignment for padded/tiled execution: one VPU tile row is
# 8 sublanes x 128 lanes.
TILE_ROWS = 1024


@dataclasses.dataclass
class ExecContext:
    """Execution context threaded through kernels (reference: exec.h:58).

    ``exec_chunksize`` plays the role of the reference's chunked execution
    target; ``interpret`` forces Pallas kernels into interpreter mode
    (useful on CPU test meshes).
    """

    exec_chunksize: int = TARGET_BATCH_ROWS
    use_threads: bool = True
    interpret: Optional[bool] = None  # None = auto (interpret iff not on TPU)
    device: Optional[jax.Device] = None

    def pallas_interpret(self) -> bool:
        if self.interpret is not None:
            return self.interpret
        return jax.default_backend() not in ("tpu",)


_default_context = ExecContext()


def default_context() -> ExecContext:
    return _default_context
