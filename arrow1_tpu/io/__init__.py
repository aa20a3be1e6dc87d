"""IO: host-boundary ingest/egress + readahead pipelining.

Stance (SURVEY.md §3.4a): stage-1 decode (CSV/Parquet/JSON/IPC bytes ->
columnar) reuses the battle-tested Arrow host libraries via pyarrow; the
engine's own format normalization (dictionary-encode, mask unpack,
fixed-width) happens in interop.py; the device pipeline starts at
"RecordBatch of fixed-width/dict columns". A custom C++ decode path (see
native/) is only warranted if host decode bottlenecks multi-host scale.

prefetch.py supplies the AsyncGenerator-readahead analogue
(util/async_generator.h:898): a background-thread iterator that overlaps
host decode + H2D transfer with device compute.
"""

from .ipc import (read_feather, read_ipc, write_feather, write_ipc,  # noqa: F401
                  IpcStreamReader, IpcStreamWriter)
from .csv import read_csv, write_csv  # noqa: F401
from .orc import read_orc, write_orc  # noqa: F401
from .parquet import read_parquet, write_parquet  # noqa: F401
from .json import read_json  # noqa: F401
from .prefetch import ReadaheadIterator, prefetch_batches  # noqa: F401
