"""Native Flight transport (arrow1_tpu/flight_native.py + flight_proto.py).

Covers the hand-built protobuf codec, native-server<->native-client RPC
over every method, and wire interop with pyarrow.flight in BOTH
directions (pyarrow client -> native server, native client -> pyarrow
server). Reference semantics: cpp/src/arrow/flight/server.h:161,
client.h:168, serialization_internal.cc:192.
"""

import numpy as np
import pyarrow as pa
import pytest

import arrow1_tpu as a1t
from arrow1_tpu import flight_proto as fp
from arrow1_tpu.flight_native import (NativeFlightClient, NativeTableServer,
                                      encapsulated_schema,
                                      serve_tables_native)
from arrow1_tpu.table import Table


def make_batch():
    return a1t.record_batch({
        "i": [1, 2, None, 4],
        "f": [0.5, None, 2.5, -3.0],
        "s": ["aa", None, "bb", "aa"],
    })


class TestProtoCodec:
    def test_flight_info_roundtrip(self):
        info = fp.FlightInfo(
            schema=b"\x01\x02\x03",
            descriptor=fp.FlightDescriptor.for_path("a", "b"),
            endpoints=[fp.FlightEndpoint(
                ticket=fp.Ticket(b"tkt"),
                locations=[fp.Location("grpc://h:1")])],
            total_records=-1, total_bytes=12345)
        back = fp.FlightInfo.decode(info.encode())
        assert back.schema == b"\x01\x02\x03"
        assert back.descriptor.path == ["a", "b"]
        assert back.endpoints[0].ticket.ticket == b"tkt"
        assert back.endpoints[0].locations[0].uri == "grpc://h:1"
        assert back.total_records == -1
        assert back.total_bytes == 12345

    def test_flight_data_field_1000(self):
        fd = fp.FlightData(data_header=b"hdr", data_body=b"B" * 100,
                           app_metadata=b"m")
        raw = fd.encode()
        # data_body (field 1000) must serialize after the small fields
        # (serialization_internal.cc:192 relies on this ordering).
        assert raw.index(b"B" * 100) > raw.index(b"hdr")
        back = fp.FlightData.decode(raw)
        assert back.data_header == b"hdr"
        assert back.data_body == b"B" * 100
        assert back.app_metadata == b"m"

    def test_descriptor_cmd(self):
        d = fp.FlightDescriptor.for_command(b"SELECT 1")
        back = fp.FlightDescriptor.decode(d.encode())
        assert back.type == fp.FlightDescriptor.CMD
        assert back.cmd == b"SELECT 1"


class TestNativeToNative:
    def test_full_surface(self):
        rb = make_batch()
        with serve_tables_native({"t1": Table([rb])}) as server:
            with NativeFlightClient(server.location) as client:
                # ListFlights / GetFlightInfo
                infos = client.list_flights()
                assert [i.descriptor.path[0] for i in infos] == ["t1"]
                assert infos[0].total_records == 4
                info = client.get_flight_info("t1")
                assert info.endpoints[0].ticket.ticket == b"t1"
                # GetSchema -> pyarrow parses our encapsulated bytes
                schema = pa.ipc.read_schema(
                    pa.py_buffer(client.get_schema("t1")))
                assert schema.names == ["i", "f", "s"]
                # DoGet
                got = client.do_get(b"t1")
                oracle = rb.to_arrow()
                assert got.batches[0].to_arrow().equals(oracle)
                # DoPut then DoGet it back
                client.do_put("t2", rb)
                got2 = client.do_get(b"t2")
                assert got2.batches[0].to_arrow().equals(oracle)
                # Handshake echoes
                assert client.handshake(b"hello") == b"hello"
                # ListActions / DoAction drop
                acts = client.list_actions()
                assert [a.type for a in acts] == ["drop"]
                client.do_action("drop", b"t1")
                assert [i.descriptor.path[0]
                        for i in client.list_flights()] == ["t2"]
                # Missing table -> KeyError (NOT_FOUND)
                with pytest.raises(KeyError):
                    client.do_get(b"nope")

    def test_multi_batch_stream(self):
        rbs = [a1t.record_batch({"x": list(range(i * 3, i * 3 + 3))})
               for i in range(4)]
        with serve_tables_native({"m": Table(rbs)}) as server:
            with NativeFlightClient(server.location) as client:
                got = client.do_get(b"m")
                assert len(got.batches) == 4
                vals = [v for b in got.batches
                        for v in b.to_arrow()["x"].to_pylist()]
                assert vals == list(range(12))

    def test_do_exchange_transform(self):
        server = NativeTableServer()
        server.set_exchange_fn(
            lambda b: a1t.record_batch(
                {"x": [v * 2 for v in b.to_arrow()["x"].to_pylist()]}))
        with server:
            with NativeFlightClient(server.location) as client:
                out = client.do_exchange(
                    "double", a1t.record_batch({"x": [1, 2, 3]}))
                assert out.batches[0].to_arrow()["x"].to_pylist() == [2, 4, 6]


class TestWireInteropPyarrowClient:
    """pyarrow.flight client against the native server — proves our
    gRPC framing + protobuf + IPC bytes are what the C++ stack expects."""

    def test_do_get(self):
        import pyarrow.flight as fl

        rb = make_batch()
        with serve_tables_native({"t": Table([rb])}) as server:
            client = fl.connect(server.location)
            got = client.do_get(fl.Ticket(b"t")).read_all()
            assert got.combine_chunks().to_batches()[0].equals(rb.to_arrow())

    def test_do_put_and_info(self):
        import pyarrow.flight as fl

        rb = make_batch()
        with NativeTableServer() as server:
            client = fl.connect(server.location)
            desc = fl.FlightDescriptor.for_path("up")
            writer, _ = client.do_put(desc, rb.to_arrow().schema)
            writer.write_batch(rb.to_arrow())
            writer.close()
            # stored table round-trips through GetFlightInfo + DoGet
            info = client.get_flight_info(desc)
            assert info.total_records == 4
            assert info.schema.names == ["i", "f", "s"]
            got = client.do_get(fl.Ticket(b"up")).read_all()
            assert got.to_batches()[0].equals(rb.to_arrow())

    def test_get_schema_and_actions(self):
        import pyarrow.flight as fl

        rb = make_batch()
        with serve_tables_native({"t": Table([rb])}) as server:
            client = fl.connect(server.location)
            schema = client.get_schema(
                fl.FlightDescriptor.for_path("t")).schema
            assert schema.names == ["i", "f", "s"]
            assert [a.type for a in client.list_actions()] == ["drop"]
            list(client.do_action(fl.Action("drop", b"t")))
            assert list(client.list_flights()) == []


class TestWireInteropPyarrowServer:
    """Native client against pyarrow.flight's C++ server."""

    def test_do_get_and_put(self):
        from arrow1_tpu.flight import serve_tables

        rb = make_batch()
        with serve_tables({"t": rb}) as server:
            with NativeFlightClient(server.location) as client:
                got = client.do_get(b"t")
                assert got.batches[0].to_arrow().equals(rb.to_arrow())
                client.do_put("t2", rb)
                got2 = client.do_get(b"t2")
                assert got2.batches[0].to_arrow().equals(rb.to_arrow())
                names = [i.descriptor.path[0]
                         for i in client.list_flights()]
                assert sorted(names) == ["t", "t2"]


class TestAuthMiddlewareTls:
    def test_basic_auth_gates_calls(self):
        from arrow1_tpu.flight_native import BasicAuthHandler

        rb = make_batch()
        server = NativeTableServer(
            auth_handler=BasicAuthHandler({"alice": "pw"}))
        server.add_table("t", Table([rb]))
        with server:
            with NativeFlightClient(server.location) as client:
                # unauthenticated call rejected
                with pytest.raises(PermissionError):
                    client.do_get(b"t")
                # bad credentials rejected at handshake
                with pytest.raises(PermissionError):
                    client.authenticate(b"alice:wrong")
                # good credentials: token unlocks the call
                client.authenticate(b"alice:pw")
                got = client.do_get(b"t")
                assert got.batches[0].to_arrow().equals(rb.to_arrow())

    def test_middleware_observes_calls(self):
        from arrow1_tpu.flight_native import (ServerMiddleware,
                                              ServerMiddlewareFactory)

        calls = []

        class MW(ServerMiddleware):
            def __init__(self, method):
                self.method = method

            def sending_headers(self):
                return {"x-a1t-trace": "1"}

            def call_completed(self, exc):
                calls.append((self.method, exc is None))

        class Factory(ServerMiddlewareFactory):
            def start_call(self, method, headers):
                return MW(method)

        rb = make_batch()
        server = NativeTableServer(middleware={"trace": Factory()})
        server.add_table("t", Table([rb]))
        with server:
            with NativeFlightClient(server.location) as client:
                client.do_get(b"t")
                client.list_flights()
        assert ("DoGet", True) in calls
        assert ("ListFlights", True) in calls

    def test_tls_roundtrip(self, tmp_path):
        import subprocess

        key = tmp_path / "key.pem"
        crt = tmp_path / "crt.pem"
        subprocess.run(
            ["openssl", "req", "-x509", "-newkey", "rsa:2048",
             "-keyout", str(key), "-out", str(crt), "-days", "1",
             "-nodes", "-subj", "/CN=localhost",
             "-addext", "subjectAltName=DNS:localhost"],
            check=True, capture_output=True)
        rb = make_batch()
        server = NativeTableServer(
            location="grpc+tls://localhost:0",
            tls_certificates=[(crt.read_bytes(), key.read_bytes())])
        server.add_table("t", Table([rb]))
        with server:
            client = NativeFlightClient(
                f"grpc+tls://localhost:{server.port}",
                tls_root_certs=crt.read_bytes())
            with client:
                got = client.do_get(b"t")
                assert got.batches[0].to_arrow().equals(rb.to_arrow())

    def test_binary_token(self):
        from arrow1_tpu.flight_native import ServerAuthHandler

        class RandomToken(ServerAuthHandler):
            TOKEN = bytes([0x8F, 0x02, 0xFF, 0x00, 0x42] * 4)

            def authenticate(self, payload):
                if payload != b"open sesame":
                    raise ValueError("bad payload")
                return self.TOKEN

            def is_valid(self, token):
                if token != self.TOKEN:
                    raise ValueError("bad token")
                return b"peer"

        rb = make_batch()
        server = NativeTableServer(auth_handler=RandomToken())
        server.add_table("t", Table([rb]))
        with server:
            with NativeFlightClient(server.location) as client:
                client.authenticate(b"open sesame")
                got = client.do_get(b"t")
                assert got.batches[0].to_arrow().equals(rb.to_arrow())
