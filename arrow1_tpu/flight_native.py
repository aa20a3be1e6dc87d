"""Native Arrow Flight transport: gRPC service + hand-built protobuf +
native IPC payloads. No pyarrow.flight anywhere on this path.

Reference: cpp/src/arrow/flight/ — server.h:161 FlightServerBase,
client.h:168 FlightClient, serialization_internal.cc:192 (FlightData
framing: data_header = IPC Message flatbuffer, data_body = buffer
payload), types.h (FlightInfo/Descriptor/Ticket semantics).

The data plane reuses io/ipc_native.py's message builders/readers — a
Flight stream is exactly an IPC stream with gRPC's length-prefix framing
substituted for the IPC continuation framing:

    FlightData #0   schema message   (data_header only)
    FlightData #i   dictionary batches, then record batches
                    (data_header = Message fb, data_body = buffers)

Wire-interop is oracle-tested against pyarrow.flight in both directions
(tests/test_flight_native.py).
"""

from __future__ import annotations

import struct
import threading
from concurrent import futures
from typing import Callable, Dict, Iterable, Iterator, List, Optional

from . import flight_proto as fp
from .errors import Invalid
from .io import ipc_native as ipc
from .table import RecordBatch, Table

__all__ = ["NativeFlightServer", "NativeFlightClient", "NativeTableServer",
           "batches_to_flight_stream", "FlightStreamReader",
           "serve_tables_native", "ServerAuthHandler", "BasicAuthHandler",
           "ServerMiddleware", "ServerMiddlewareFactory"]

_SVC = "/arrow.flight.protocol.FlightService/"


# ====================================================================
# data plane: engine batches <-> FlightData stream
# ====================================================================

def schema_message(batch: RecordBatch) -> bytes:
    """Bare schema Message flatbuffer for a batch (no IPC framing)."""
    import flatbuffers

    b = flatbuffers.Builder(1024)
    off = ipc._build_schema(b, batch, ipc._dict_columns(batch))
    return ipc._finish_message(b, ipc.HDR_SCHEMA, off, 0)


def encapsulated_schema(batch: RecordBatch) -> bytes:
    """Schema as an encapsulated IPC message — the FlightInfo.schema /
    SchemaResult.schema representation (== pyarrow Schema.serialize())."""
    return ipc._encapsulate(schema_message(batch), b"")


def batches_to_flight_stream(
        batches: List[RecordBatch],
        descriptor: Optional[fp.FlightDescriptor] = None,
) -> Iterator[fp.FlightData]:
    """Yield the FlightData sequence for a stream of engine batches."""
    if not batches:
        raise Invalid("flight: cannot stream zero batches (engine tables "
                      "carry their schema on batches; send a zero-row "
                      "batch instead)")
    first = batches[0]
    dict_ids = ipc._dict_columns(first)
    yield fp.FlightData(descriptor=descriptor,
                        data_header=schema_message(first))
    for name, did in dict_ids.items():
        meta, body = ipc._serialize_dictionary(
            did, first.column(name).dictionary.values)
        yield fp.FlightData(data_header=meta, data_body=body)
    for batch in batches:
        meta, body = ipc.serialize_batch(batch)
        yield fp.FlightData(data_header=meta, data_body=body)


def _bare_header(hdr: bytes) -> bytes:
    """Tolerate an encapsulated header (continuation + length prefix) —
    ours and pyarrow's are bare, but C++ Message::Open accepts both."""
    if len(hdr) >= 8 and struct.unpack_from("<I", hdr)[0] == \
            ipc.CONTINUATION:
        (ln,) = struct.unpack_from("<i", hdr, 4)
        return hdr[8:8 + ln]
    return hdr


class FlightStreamReader:
    """Incremental FlightData -> engine-batch decoder (one per stream)."""

    def __init__(self):
        self.fields = None
        self.metadata = None
        self.descriptor: Optional[fp.FlightDescriptor] = None
        self._dicts: Dict[int, object] = {}

    def feed(self, fd: fp.FlightData) -> Optional[RecordBatch]:
        """Returns a RecordBatch when fd completes one, else None."""
        if fd.descriptor is not None and self.descriptor is None:
            self.descriptor = fd.descriptor
        if not fd.data_header:
            return None
        msg = ipc._root(_bare_header(fd.data_header))
        htype = msg.u8(1)
        if htype == ipc.HDR_SCHEMA:
            schema_t = msg.table(2)
            self.fields = ipc._schema_from_fb(schema_t)
            self.metadata = ipc._read_kv_vector(schema_t, 2)
            return None
        if self.fields is None:
            raise Invalid("flight: data before schema message")
        if htype == ipc.HDR_DICTBATCH:
            did, vals = ipc._read_dictionary(msg, fd.data_body)
            self._dicts[did] = vals
            return None
        if htype == ipc.HDR_RECORDBATCH:
            b = ipc.deserialize_batch(msg, fd.data_body, self.fields,
                                      self._dicts)
            if self.metadata:
                b = b.replace_schema_metadata(dict(self.metadata))
            return b
        raise Invalid(f"flight: unexpected IPC message type {htype}")

    def read_all(self, stream: Iterable[fp.FlightData]) -> List[RecordBatch]:
        out = []
        for raw in stream:
            fd = raw if isinstance(raw, fp.FlightData) else \
                fp.FlightData.decode(raw)
            b = self.feed(fd)
            if b is not None:
                out.append(b)
        return out


def _as_batches(data) -> List[RecordBatch]:
    if isinstance(data, Table):
        return list(data.batches)
    if isinstance(data, RecordBatch):
        return [data]
    return list(data)


# ====================================================================
# server
# ====================================================================

def _parse_location(location: str) -> str:
    for scheme in ("grpc+tcp://", "grpc+tls://", "grpc://"):
        if location.startswith(scheme):
            return location[len(scheme):]
    return location


class _Generic:
    """grpc.GenericRpcHandler over a method-name -> handler table."""

    def __init__(self, table):
        self._table = table

    def service(self, handler_call_details):
        return self._table.get(handler_call_details.method)


class ServerAuthHandler:
    """flight/server_auth.h analogue: handshake issues a token; every
    later call presents it in the `authorization` metadata header."""

    def authenticate(self, payload: bytes) -> bytes:
        """Handshake payload -> token (raise to reject)."""
        raise NotImplementedError

    def is_valid(self, token: bytes) -> bytes:
        """Token -> peer identity (raise to reject)."""
        raise NotImplementedError


class BasicAuthHandler(ServerAuthHandler):
    """Username/password table; token = the accepted credential blob."""

    def __init__(self, creds: Dict[str, str]):
        self._creds = dict(creds)

    def authenticate(self, payload: bytes) -> bytes:
        user, _, pw = payload.decode().partition(":")
        if self._creds.get(user) != pw:
            raise Invalid("invalid credentials")
        return payload

    def is_valid(self, token: bytes) -> bytes:
        user, _, pw = token.decode().partition(":")
        if self._creds.get(user) != pw:
            raise Invalid("invalid token")
        return user.encode()


class ServerMiddleware:
    """flight/server_middleware.h analogue (one instance per call)."""

    def sending_headers(self) -> Dict[str, str]:
        return {}

    def call_completed(self, exc: Optional[BaseException]) -> None:
        pass


class ServerMiddlewareFactory:
    def start_call(self, method: str,
                   headers: Dict[str, str]) -> Optional[ServerMiddleware]:
        return None


class NativeFlightServer:
    """FlightServerBase analogue (reference: flight/server.h:161).

    Subclass and override the do_* hooks; all argument/return types are
    engine types (RecordBatch/Table) or flight_proto messages. Unset
    hooks abort with UNIMPLEMENTED, matching the reference default.

    auth_handler: ServerAuthHandler — Handshake authenticates, all other
    methods require the returned token in `authorization` metadata.
    middleware: {name: ServerMiddlewareFactory} invoked per call.
    tls_certificates: [(cert_chain_pem, private_key_pem)] enables TLS.
    """

    def __init__(self, location: str = "grpc://0.0.0.0:0",
                 max_workers: int = 8,
                 auth_handler: Optional[ServerAuthHandler] = None,
                 middleware: Optional[Dict[str, object]] = None,
                 tls_certificates=None):
        import grpc

        self._grpc = grpc
        self._auth = auth_handler
        self._middleware = dict(middleware or {})
        self._server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=max_workers),
            options=[("grpc.max_receive_message_length", -1),
                     ("grpc.max_send_message_length", -1)])
        us, uu, ss = (grpc.unary_stream_rpc_method_handler,
                      grpc.unary_unary_rpc_method_handler,
                      grpc.stream_stream_rpc_method_handler)

        def gate(name, fn, streaming):
            # auth + middleware wrapper around every wire adapter
            if streaming:
                def stream(req, context):
                    live = self._enter_call(context, name)
                    try:
                        yield from fn(req, context)
                    except BaseException as e:
                        self._exit_call(live, e)
                        raise
                    self._exit_call(live)
                return stream

            def unary(req, context):
                live = self._enter_call(context, name)
                try:
                    out = fn(req, context)
                except BaseException as e:
                    self._exit_call(live, e)
                    raise
                self._exit_call(live)
                return out
            return unary

        table = {
            _SVC + "Handshake": ss(gate("Handshake",
                                        self._rpc_handshake, True)),
            _SVC + "ListFlights": us(gate("ListFlights",
                                          self._rpc_list_flights, True)),
            _SVC + "GetFlightInfo": uu(gate("GetFlightInfo",
                                            self._rpc_get_flight_info,
                                            False)),
            _SVC + "GetSchema": uu(gate("GetSchema", self._rpc_get_schema,
                                        False)),
            _SVC + "DoGet": us(gate("DoGet", self._rpc_do_get, True)),
            _SVC + "DoPut": ss(gate("DoPut", self._rpc_do_put, True)),
            _SVC + "DoExchange": ss(gate("DoExchange",
                                         self._rpc_do_exchange, True)),
            _SVC + "DoAction": us(gate("DoAction", self._rpc_do_action,
                                       True)),
            _SVC + "ListActions": us(gate("ListActions",
                                          self._rpc_list_actions, True)),
        }
        self._server.add_generic_rpc_handlers((_Generic(table),))
        addr = _parse_location(location)
        if tls_certificates:
            creds = grpc.ssl_server_credentials(
                [(key, chain) for chain, key in tls_certificates])
            self.port = self._server.add_secure_port(addr, creds)
            self._tls = True
        else:
            self.port = self._server.add_insecure_port(addr)
            self._tls = False
        if self.port == 0:
            raise Invalid(f"flight: cannot bind {location!r}")
        self._started = False

    # -------- per-call gate: auth + middleware --------

    def _enter_call(self, context, method: str):
        meta = {k: v for k, v in (context.invocation_metadata() or ())}
        if self._auth is not None and method != "Handshake":
            token = meta.get("authorization-bin",
                             meta.get("authorization", ""))
            token = token.encode() if isinstance(token, str) else token
            try:
                self._auth.is_valid(token)
            except Exception as e:
                context.abort(self._grpc.StatusCode.UNAUTHENTICATED,
                              str(e))
        live = []
        send: Dict[str, str] = {}
        for name, factory in self._middleware.items():
            mw = factory.start_call(method, meta)
            if mw is not None:
                live.append(mw)
                send.update(mw.sending_headers())
        if send:
            context.send_initial_metadata(tuple(send.items()))
        return live

    def _exit_call(self, live, exc=None):
        for mw in live:
            mw.call_completed(exc)

    # -------- overridable hooks (engine-level) --------

    def do_get(self, context, ticket: fp.Ticket):
        """-> Table | RecordBatch | iterable of RecordBatch."""
        context.abort(self._grpc.StatusCode.UNIMPLEMENTED, "DoGet")

    def do_put(self, context, descriptor: fp.FlightDescriptor,
               batches: List[RecordBatch]):
        context.abort(self._grpc.StatusCode.UNIMPLEMENTED, "DoPut")

    def do_exchange(self, context, descriptor: fp.FlightDescriptor,
                    batches: Iterator[RecordBatch]
                    ) -> Iterable[RecordBatch]:
        context.abort(self._grpc.StatusCode.UNIMPLEMENTED, "DoExchange")

    def list_flights(self, context,
                     criteria: fp.Criteria) -> Iterable[fp.FlightInfo]:
        context.abort(self._grpc.StatusCode.UNIMPLEMENTED, "ListFlights")

    def get_flight_info(self, context,
                        descriptor: fp.FlightDescriptor) -> fp.FlightInfo:
        context.abort(self._grpc.StatusCode.UNIMPLEMENTED,
                      "GetFlightInfo")

    def get_schema(self, context,
                   descriptor: fp.FlightDescriptor) -> bytes:
        """-> encapsulated schema bytes (use encapsulated_schema())."""
        context.abort(self._grpc.StatusCode.UNIMPLEMENTED, "GetSchema")

    def do_action(self, context, action: fp.Action) -> Iterable[bytes]:
        context.abort(self._grpc.StatusCode.UNIMPLEMENTED,
                      f"action {action.type!r}")

    def list_actions(self, context) -> Iterable[fp.ActionType]:
        return []

    def handshake(self, context, payload: bytes) -> bytes:
        if self._auth is not None:
            try:
                return self._auth.authenticate(payload)
            except Exception as e:
                context.abort(self._grpc.StatusCode.UNAUTHENTICATED,
                              str(e))
        return payload

    # -------- wire adapters --------

    def _rpc_handshake(self, request_iter, context):
        for raw in request_iter:
            req = fp.HandshakeRequest.decode(raw)
            yield fp.HandshakeResponse(
                protocol_version=req.protocol_version,
                payload=self.handshake(context, req.payload)).encode()

    def _rpc_list_flights(self, request, context):
        for info in self.list_flights(context, fp.Criteria.decode(request)):
            yield info.encode()

    def _rpc_get_flight_info(self, request, context):
        info = self.get_flight_info(
            context, fp.FlightDescriptor.decode(request))
        return info.encode()

    def _rpc_get_schema(self, request, context):
        schema = self.get_schema(context,
                                 fp.FlightDescriptor.decode(request))
        return fp.SchemaResult(schema=schema).encode()

    def _rpc_do_get(self, request, context):
        data = self.do_get(context, fp.Ticket.decode(request))
        for fd in batches_to_flight_stream(_as_batches(data)):
            yield fd.encode()

    def _rpc_do_put(self, request_iter, context):
        reader = FlightStreamReader()
        batches = reader.read_all(request_iter)
        if reader.descriptor is None:
            context.abort(self._grpc.StatusCode.INVALID_ARGUMENT,
                          "DoPut stream carried no descriptor")
        self.do_put(context, reader.descriptor, batches)
        yield fp.PutResult().encode()

    def _rpc_do_exchange(self, request_iter, context):
        reader = FlightStreamReader()

        def in_batches():
            for raw in request_iter:
                b = reader.feed(fp.FlightData.decode(raw))
                if b is not None:
                    yield b

        # Descriptor arrives on the first message; pull it eagerly.
        it = in_batches()
        first: List[RecordBatch] = []
        for b in it:
            first.append(b)
            break
        out = self.do_exchange(context, reader.descriptor,
                               iter(first) if not first else
                               _chain(first, it))
        started = False
        for batch in out:
            if not started:
                yield fp.FlightData(
                    data_header=schema_message(batch)).encode()
                for name, did in ipc._dict_columns(batch).items():
                    meta, body = ipc._serialize_dictionary(
                        did, batch.column(name).dictionary.values)
                    yield fp.FlightData(data_header=meta,
                                        data_body=body).encode()
                started = True
            meta, body = ipc.serialize_batch(batch)
            yield fp.FlightData(data_header=meta, data_body=body).encode()

    def _rpc_do_action(self, request, context):
        for body in self.do_action(context, fp.Action.decode(request)):
            yield fp.Result(body=body).encode()

    def _rpc_list_actions(self, request, context):
        for at in self.list_actions(context):
            yield at.encode()

    # -------- lifecycle --------

    def serve_background(self):
        if not self._started:
            self._server.start()
            self._started = True
        return self

    # pyarrow-shaped alias: blocking serve
    def serve(self):
        self.serve_background()
        self._server.wait_for_termination()

    def shutdown(self):
        self._server.stop(grace=0.5)

    def __enter__(self):
        return self.serve_background()

    def __exit__(self, *exc):
        self.shutdown()


def _chain(head, tail):
    for x in head:
        yield x
    for x in tail:
        yield x


class NativeTableServer(NativeFlightServer):
    """Named-table Flight server on the native transport — the
    FlightTableServer surface (flight.py) with zero pyarrow on the wire.

    - DoGet(ticket=name)      -> stream the table
    - DoPut(descriptor=name)  -> receive and store
    - ListFlights / GetFlightInfo / GetSchema over the stored tables
    - DoAction("drop", name)  -> remove; ListActions advertises it
    - DoExchange              -> echo, or the transform set via
                                 set_exchange_fn (e.g. a compiled pipeline)
    """

    def __init__(self, location: str = "grpc://0.0.0.0:0", **kw):
        super().__init__(location, **kw)
        self.tables: Dict[str, Table] = {}
        self._lock = threading.Lock()
        self._exchange_fn: Optional[Callable] = None

    @property
    def location(self) -> str:
        scheme = "grpc+tls" if self._tls else "grpc"
        return f"{scheme}://localhost:{self.port}"

    def add_table(self, name: str, data):
        with self._lock:
            self.tables[name] = Table(_as_batches(data))

    def set_exchange_fn(self, fn):
        self._exchange_fn = fn

    def _lookup(self, context, name: str) -> Table:
        with self._lock:
            tbl = self.tables.get(name)
        if tbl is None:
            context.abort(self._grpc.StatusCode.NOT_FOUND,
                          f"no table {name!r}")
        return tbl

    def _info(self, name: str, tbl: Table) -> fp.FlightInfo:
        return fp.FlightInfo(
            schema=encapsulated_schema(tbl.batches[0]),
            descriptor=fp.FlightDescriptor.for_path(name),
            endpoints=[fp.FlightEndpoint(
                ticket=fp.Ticket(name.encode()),
                locations=[fp.Location(self.location)])],
            total_records=tbl.num_rows, total_bytes=-1)

    def do_get(self, context, ticket: fp.Ticket):
        return self._lookup(context, ticket.ticket.decode())

    def do_put(self, context, descriptor, batches):
        if descriptor.path:
            name = descriptor.path[0]
        else:
            name = descriptor.cmd.decode()
        with self._lock:
            self.tables[name] = Table(batches)

    def list_flights(self, context, criteria):
        with self._lock:
            items = list(self.tables.items())
        for name, tbl in items:
            yield self._info(name, tbl)

    def get_flight_info(self, context, descriptor):
        name = descriptor.path[0] if descriptor.path else \
            descriptor.cmd.decode()
        return self._info(name, self._lookup(context, name))

    def get_schema(self, context, descriptor):
        name = descriptor.path[0] if descriptor.path else \
            descriptor.cmd.decode()
        return encapsulated_schema(self._lookup(context, name).batches[0])

    def do_action(self, context, action):
        if action.type == "drop":
            with self._lock:
                self.tables.pop(action.body.decode(), None)
            return []
        context.abort(self._grpc.StatusCode.INVALID_ARGUMENT,
                      f"unknown action {action.type!r}")

    def list_actions(self, context):
        return [fp.ActionType("drop", "remove a named table")]

    def do_exchange(self, context, descriptor, batches):
        fn = self._exchange_fn
        for b in batches:
            yield fn(b) if fn is not None else b


def serve_tables_native(tables: Dict[str, Table],
                        location: str = "grpc://0.0.0.0:0"
                        ) -> NativeTableServer:
    """Convenience: background native server with the given tables."""
    server = NativeTableServer(location)
    for name, tbl in tables.items():
        server.add_table(name, tbl)
    return server.serve_background()


# ====================================================================
# client
# ====================================================================

def _ident(x):
    return x


class NativeFlightClient:
    """FlightClient analogue (reference: flight/client.h:168) over raw
    gRPC bytes + flight_proto codecs."""

    def __init__(self, location: str, tls_root_certs: bytes = None):
        import grpc

        self._grpc = grpc
        self._token: Optional[bytes] = None
        opts = [("grpc.max_receive_message_length", -1),
                ("grpc.max_send_message_length", -1)]
        addr = _parse_location(location)
        if tls_root_certs is not None or \
                location.startswith("grpc+tls://"):
            creds = grpc.ssl_channel_credentials(
                root_certificates=tls_root_certs)
            # self-signed test certs are issued for 'localhost'
            self._channel = grpc.secure_channel(addr, creds, options=opts)
        else:
            self._channel = grpc.insecure_channel(addr, options=opts)

        outer = self

        def _meta():
            if outer._token is None:
                return None
            tok = outer._token
            if isinstance(tok, str):
                return (("authorization", tok),)
            try:
                return (("authorization", tok.decode("ascii")),)
            except UnicodeDecodeError:
                # binary tokens ride a -bin key (gRPC metadata rule)
                return (("authorization-bin", tok),)

        def uu(name):
            mc = self._channel.unary_unary(
                _SVC + name, request_serializer=_ident,
                response_deserializer=_ident)
            return lambda req: mc(req, metadata=_meta())

        def us(name):
            mc = self._channel.unary_stream(
                _SVC + name, request_serializer=_ident,
                response_deserializer=_ident)
            return lambda req: mc(req, metadata=_meta())

        def ss(name):
            mc = self._channel.stream_stream(
                _SVC + name, request_serializer=_ident,
                response_deserializer=_ident)
            return lambda req: mc(req, metadata=_meta())

        self._do_get = us("DoGet")
        self._do_put = ss("DoPut")
        self._do_exchange = ss("DoExchange")
        self._list_flights = us("ListFlights")
        self._get_flight_info = uu("GetFlightInfo")
        self._get_schema = uu("GetSchema")
        self._do_action = us("DoAction")
        self._list_actions = us("ListActions")
        self._handshake = ss("Handshake")

    def _wrap(self, err):
        code = err.code()
        detail = err.details()
        if code == self._grpc.StatusCode.NOT_FOUND:
            return KeyError(detail)
        if code == self._grpc.StatusCode.UNAUTHENTICATED:
            return PermissionError(detail)
        return Invalid(f"flight: {code.name}: {detail}")

    def do_get(self, ticket) -> Table:
        t = ticket if isinstance(ticket, fp.Ticket) else \
            fp.Ticket(ticket if isinstance(ticket, bytes)
                      else str(ticket).encode())
        try:
            batches = FlightStreamReader().read_all(
                self._do_get(t.encode()))
        except self._grpc.RpcError as e:
            raise self._wrap(e) from None
        if not batches:
            raise Invalid("flight: DoGet streamed no batches")
        return Table(batches)

    def do_put(self, descriptor, data) -> None:
        desc = descriptor if isinstance(descriptor, fp.FlightDescriptor) \
            else fp.FlightDescriptor.for_path(str(descriptor))
        stream = (fd.encode() for fd in batches_to_flight_stream(
            _as_batches(data), descriptor=desc))
        try:
            for _ in self._do_put(stream):
                pass
        except self._grpc.RpcError as e:
            raise self._wrap(e) from None

    def do_exchange(self, descriptor, data) -> Table:
        desc = descriptor if isinstance(descriptor, fp.FlightDescriptor) \
            else fp.FlightDescriptor.for_path(str(descriptor))
        stream = (fd.encode() for fd in batches_to_flight_stream(
            _as_batches(data), descriptor=desc))
        try:
            batches = FlightStreamReader().read_all(self._do_exchange(stream))
        except self._grpc.RpcError as e:
            raise self._wrap(e) from None
        if not batches:
            raise Invalid("flight: DoExchange returned no batches")
        return Table(batches)

    def list_flights(self,
                     criteria: bytes = b"") -> List[fp.FlightInfo]:
        try:
            return [fp.FlightInfo.decode(raw) for raw in
                    self._list_flights(
                        fp.Criteria(expression=criteria).encode())]
        except self._grpc.RpcError as e:
            raise self._wrap(e) from None

    def get_flight_info(self, descriptor) -> fp.FlightInfo:
        desc = descriptor if isinstance(descriptor, fp.FlightDescriptor) \
            else fp.FlightDescriptor.for_path(str(descriptor))
        try:
            return fp.FlightInfo.decode(self._get_flight_info(
                desc.encode()))
        except self._grpc.RpcError as e:
            raise self._wrap(e) from None

    def get_schema(self, descriptor) -> bytes:
        """-> encapsulated IPC schema message bytes."""
        desc = descriptor if isinstance(descriptor, fp.FlightDescriptor) \
            else fp.FlightDescriptor.for_path(str(descriptor))
        try:
            return fp.SchemaResult.decode(
                self._get_schema(desc.encode())).schema
        except self._grpc.RpcError as e:
            raise self._wrap(e) from None

    def do_action(self, action, body: bytes = b"") -> List[bytes]:
        act = action if isinstance(action, fp.Action) else \
            fp.Action(type=str(action), body=body)
        try:
            return [fp.Result.decode(raw).body
                    for raw in self._do_action(act.encode())]
        except self._grpc.RpcError as e:
            raise self._wrap(e) from None

    def list_actions(self) -> List[fp.ActionType]:
        try:
            return [fp.ActionType.decode(raw)
                    for raw in self._list_actions(fp.Empty().encode())]
        except self._grpc.RpcError as e:
            raise self._wrap(e) from None

    def authenticate(self, payload: bytes) -> bytes:
        """Handshake + remember the issued token: later calls carry it
        as `authorization` metadata (client_auth.h analogue)."""
        token = self.handshake(payload)
        self._token = token
        return token

    def handshake(self, payload: bytes = b"") -> bytes:
        req = fp.HandshakeRequest(payload=payload).encode()
        try:
            for raw in self._handshake(iter([req])):
                return fp.HandshakeResponse.decode(raw).payload
        except self._grpc.RpcError as e:
            raise self._wrap(e) from None
        return b""

    def close(self):
        self._channel.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
