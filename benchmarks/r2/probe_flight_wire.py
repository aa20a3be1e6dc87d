"""Probe pyarrow.flight's wire format with a raw-bytes gRPC client.

Determines empirically:
- whether FlightData.data_header carries the IPC continuation/length
  prefix or the bare Message flatbuffer
- what FlightInfo.schema bytes look like
"""
import threading

import pyarrow as pa
import pyarrow.flight as fl
import grpc


class Server(fl.FlightServerBase):
    def __init__(self):
        super().__init__("grpc://127.0.0.1:0")
        ints = pa.array([1, 2, None], pa.int64())
        strs = pa.array(["a", "bb", "ccc"]).dictionary_encode()
        self.tbl = pa.table({"i": ints, "s": strs})

    def do_get(self, context, ticket):
        return fl.RecordBatchStream(self.tbl)

    def get_flight_info(self, context, descriptor):
        ep = fl.FlightEndpoint(b"tick", [])
        return fl.FlightInfo(self.tbl.schema, descriptor, [ep],
                             self.tbl.num_rows, -1)


srv = Server()
port = srv.port
threading.Thread(target=srv.serve, daemon=True).start()

ch = grpc.insecure_channel(f"127.0.0.1:{port}")

# raw DoGet: Ticket { bytes ticket = 1; }
ticket_msg = b"\x0a\x04tick"
doget = ch.unary_stream(
    "/arrow.flight.protocol.FlightService/DoGet",
    request_serializer=lambda x: x,
    response_deserializer=lambda x: x,
)
msgs = list(doget(ticket_msg))
print("n FlightData msgs:", len(msgs))
for i, m in enumerate(msgs):
    print(f"--- msg {i}: {len(m)} bytes; first 24: {m[:24].hex()}")

# raw GetFlightInfo: FlightDescriptor {type=1 enum, cmd=2, path=3}
desc = b"\x08\x01\x12\x03cmd"   # type=CMD? actually 1=PATH; fine
gfi = ch.unary_unary(
    "/arrow.flight.protocol.FlightService/GetFlightInfo",
    request_serializer=lambda x: x,
    response_deserializer=lambda x: x,
)
info = gfi(desc)
print("FlightInfo bytes:", len(info), "first 32:", info[:32].hex())
srv.shutdown()
