"""Flight RPC: network data plane for engine tables.

Reference: cpp/src/arrow/flight/ — gRPC service (format/Flight.proto:33:
Handshake/ListFlights/GetFlightInfo/DoGet/DoPut/DoExchange/DoAction) with
zero-copy IPC payload serialization (serialization_internal.cc:192).

Position in the TPU design (SURVEY.md §2 "Distributed exchange"): Flight
is the *host-level / DCN* data plane — cross-host ingest and egress of
tables. On-slice exchange never touches it (that's the compiled ICI
all_to_all in parallel/shuffle.py). The gRPC transport + IPC framing come
from pyarrow.flight (the same C++ stack the reference ships); this module
adapts engine tables and adds a ready-to-run table server.
"""

from __future__ import annotations

import threading
from typing import Dict, Iterator, Optional, Union

from .errors import Invalid
from .interop import record_batch_from_arrow, record_batch_to_arrow
from .table import RecordBatch, Table

__all__ = ["FlightTableServer", "FlightClient", "serve_tables",
           "NativeFlightServer", "NativeFlightClient", "NativeTableServer",
           "serve_tables_native"]


def __getattr__(name):
    # Native-transport stack (flight_native.py) re-exported here so the
    # one `arrow1_tpu.flight` namespace carries both backends.
    if name in ("NativeFlightServer", "NativeFlightClient",
                "NativeTableServer", "serve_tables_native"):
        from . import flight_native

        return getattr(flight_native, name)
    raise AttributeError(name)


class FlightTableServer:
    """A Flight server exposing named engine tables
    (reference: flight/server.h:161 FlightServerBase + test_util.cc
    FlightTestServer shape).

    - DoGet(ticket=name)     -> stream the table
    - DoPut(descriptor=name) -> receive and store a table
    - ListFlights            -> enumerate tables
    - DoAction("drop", name) -> remove
    """

    def __init__(self, location: str = "grpc://0.0.0.0:0"):
        import pyarrow.flight as fl

        outer = self

        class _Server(fl.FlightServerBase):
            def __init__(self):
                super().__init__(location)
                self.tables: Dict[str, object] = {}
                self._lock = threading.Lock()

            def do_get(self, context, ticket):
                name = ticket.ticket.decode()
                with self._lock:
                    tbl = self.tables.get(name)
                if tbl is None:
                    raise fl.FlightServerError(f"no table {name!r}")
                return fl.RecordBatchStream(tbl)

            def do_put(self, context, descriptor, reader, writer):
                name = descriptor.path[0].decode()
                tbl = reader.read_all()
                with self._lock:
                    self.tables[name] = tbl

            def list_flights(self, context, criteria):
                with self._lock:
                    items = list(self.tables.items())
                for name, tbl in items:
                    desc = fl.FlightDescriptor.for_path(name)
                    yield fl.FlightInfo(
                        tbl.schema, desc,
                        [fl.FlightEndpoint(name, [self._loc()])],
                        tbl.num_rows, -1)

            def do_action(self, context, action):
                if action.type == "drop":
                    with self._lock:
                        self.tables.pop(action.body.to_pybytes().decode(),
                                        None)
                    return []
                raise fl.FlightServerError(f"unknown action {action.type!r}")

            def do_exchange(self, context, descriptor, reader, writer):
                """Bidirectional stream (reference: Flight.proto DoExchange):
                echoes batches back after applying the registered exchange
                transform, if any (set via server.set_exchange_fn)."""
                transform = getattr(self, "_exchange_fn", None)
                started = False
                for chunk in reader:
                    batch = chunk.data
                    if transform is not None:
                        from .interop import (record_batch_from_arrow,
                                              record_batch_to_arrow)

                        batch = record_batch_to_arrow(
                            transform(record_batch_from_arrow(batch)))
                    if not started:
                        writer.begin(batch.schema)
                        started = True
                    writer.write_batch(batch)

            def _loc(self):
                return f"grpc://localhost:{self.port}"

        self._server = _Server()
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._server.port

    @property
    def location(self) -> str:
        return f"grpc://localhost:{self.port}"

    def set_exchange_fn(self, fn):
        """Server-side transform applied to DoExchange batches
        (RecordBatch -> RecordBatch) — e.g. a compiled pipeline."""
        self._server._exchange_fn = fn

    def add_table(self, name: str, data: Union[RecordBatch, Table]):
        import pyarrow as pa

        batches = data.batches if isinstance(data, Table) else [data]
        tbl = pa.Table.from_batches([record_batch_to_arrow(b)
                                     for b in batches])
        with self._server._lock:
            self._server.tables[name] = tbl

    def serve_background(self):
        self._thread = threading.Thread(target=self._server.serve,
                                        daemon=True)
        self._thread.start()
        return self

    def shutdown(self):
        self._server.shutdown()

    def __enter__(self):
        return self.serve_background()

    def __exit__(self, *exc):
        self.shutdown()


class FlightClient:
    """reference: flight/client.h:168."""

    def __init__(self, location: str):
        import pyarrow.flight as fl

        self._client = fl.connect(location)

    def get(self, name: str) -> Table:
        """DoGet -> engine Table (reference: client.cc:1153)."""
        import pyarrow.flight as fl

        reader = self._client.do_get(fl.Ticket(name.encode()))
        batches = [record_batch_from_arrow(chunk.data)
                   for chunk in reader]
        if not batches:
            raise Invalid(f"table {name!r} streamed no batches")
        return Table(batches)

    def put(self, name: str, data: Union[RecordBatch, Table]):
        """DoPut."""
        import pyarrow as pa
        import pyarrow.flight as fl

        batches = data.batches if isinstance(data, Table) else [data]
        pa_batches = [record_batch_to_arrow(b) for b in batches]
        desc = fl.FlightDescriptor.for_path(name)
        writer, _ = self._client.do_put(desc, pa_batches[0].schema)
        for b in pa_batches:
            writer.write_batch(b)
        writer.close()

    def list(self):
        return [info.descriptor.path[0].decode()
                for info in self._client.list_flights()]

    def exchange(self, name: str, data: Union[RecordBatch, Table]) -> Table:
        """DoExchange: stream batches to the server, read back the
        (possibly transformed) stream."""
        import pyarrow.flight as fl

        batches = data.batches if isinstance(data, Table) else [data]
        pa_batches = [record_batch_to_arrow(b) for b in batches]
        desc = fl.FlightDescriptor.for_path(name)
        writer, reader = self._client.do_exchange(desc)
        out = []
        with writer:
            writer.begin(pa_batches[0].schema)
            for b in pa_batches:
                writer.write_batch(b)
            writer.done_writing()
            for chunk in reader:
                out.append(record_batch_from_arrow(chunk.data))
        if not out:
            raise Invalid("exchange returned no batches")
        return Table(out)

    def drop(self, name: str):
        import pyarrow.flight as fl

        list(self._client.do_action(fl.Action("drop", name.encode())))


def serve_tables(tables: Dict[str, Union[RecordBatch, Table]],
                 location: str = "grpc://0.0.0.0:0") -> FlightTableServer:
    """Convenience: spin up a background server with the given tables."""
    server = FlightTableServer(location)
    for name, tbl in tables.items():
        server.add_table(name, tbl)
    return server.serve_background()
