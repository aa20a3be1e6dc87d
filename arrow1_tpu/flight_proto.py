"""Hand-built protobuf wire codec for the Arrow Flight protocol.

Reference: format/Flight.proto (service FlightService at line 33; message
field numbers below match it exactly — FlightData.data_body is field 1000,
serialization_internal.cc:192 relies on that so the big buffer lands last
on the wire). No protoc / no generated code: Flight's messages are simple
enough that a ~200-line varint codec covers them, the same way
io/ipc_native.py hand-builds flatbuffers.

Wire-format notes (verified against pyarrow.flight on the wire):
- FlightData.data_header carries the *bare* IPC Message flatbuffer — no
  0xFFFFFFFF continuation / length prefix (gRPC already length-frames).
- FlightInfo.schema / SchemaResult.schema carry the *encapsulated* IPC
  schema message (continuation + length + flatbuffer + padding), i.e.
  what pyarrow's Schema.serialize() produces.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Tuple

__all__ = [
    "FlightDescriptor", "FlightInfo", "FlightEndpoint", "Ticket",
    "FlightData", "PutResult", "Action", "Result", "ActionType",
    "Criteria", "Empty", "SchemaResult", "Location",
    "HandshakeRequest", "HandshakeResponse",
]


# ====================================================================
# varint / wire primitives
# ====================================================================

def _varint(n: int) -> bytes:
    """Unsigned LEB128. int64 fields encode negatives as 2^64 + n."""
    if n < 0:
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 70:
            raise ValueError("flight_proto: varint too long")


def _ld(fieldno: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint(fieldno << 3 | 2) + _varint(len(payload)) + payload


def _vi(fieldno: int, value: int) -> bytes:
    """Varint field (wire type 0). Zero default values are omitted."""
    if value == 0:
        return b""
    return _varint(fieldno << 3 | 0) + _varint(value)


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value). value is int for varint
    and fixed types, bytes for length-delimited."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
            yield fno, wt, v
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            yield fno, wt, buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            yield fno, wt, struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        elif wt == 1:
            yield fno, wt, struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        else:
            raise ValueError(f"flight_proto: unsupported wire type {wt}")


def _s64(v: int) -> int:
    """Reinterpret a decoded varint as signed int64."""
    return v - (1 << 64) if v >= 1 << 63 else v


# ====================================================================
# Flight messages (field numbers from format/Flight.proto)
# ====================================================================

@dataclass
class Ticket:
    ticket: bytes = b""

    def encode(self) -> bytes:
        return _ld(1, self.ticket) if self.ticket else b""

    @classmethod
    def decode(cls, buf: bytes) -> "Ticket":
        t = b""
        for fno, _, v in _fields(buf):
            if fno == 1:
                t = bytes(v)
        return cls(t)


@dataclass
class FlightDescriptor:
    """type: 0=UNKNOWN 1=PATH 2=CMD (Flight.proto:212)."""
    type: int = 0
    cmd: bytes = b""
    path: List[str] = field(default_factory=list)

    PATH, CMD = 1, 2

    @classmethod
    def for_path(cls, *path: str) -> "FlightDescriptor":
        return cls(type=cls.PATH, path=list(path))

    @classmethod
    def for_command(cls, cmd) -> "FlightDescriptor":
        c = cmd.encode() if isinstance(cmd, str) else bytes(cmd)
        return cls(type=cls.CMD, cmd=c)

    def encode(self) -> bytes:
        out = _vi(1, self.type)
        if self.cmd:
            out += _ld(2, self.cmd)
        for p in self.path:
            out += _ld(3, p.encode())
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "FlightDescriptor":
        d = cls()
        for fno, _, v in _fields(buf):
            if fno == 1:
                d.type = v
            elif fno == 2:
                d.cmd = bytes(v)
            elif fno == 3:
                d.path.append(bytes(v).decode())
        return d


@dataclass
class Location:
    uri: str = ""

    def encode(self) -> bytes:
        return _ld(1, self.uri.encode()) if self.uri else b""

    @classmethod
    def decode(cls, buf: bytes) -> "Location":
        u = ""
        for fno, _, v in _fields(buf):
            if fno == 1:
                u = bytes(v).decode()
        return cls(u)


@dataclass
class FlightEndpoint:
    ticket: Ticket = field(default_factory=Ticket)
    locations: List[Location] = field(default_factory=list)

    def encode(self) -> bytes:
        out = _ld(1, self.ticket.encode())
        for loc in self.locations:
            out += _ld(2, loc.encode())
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "FlightEndpoint":
        e = cls()
        for fno, _, v in _fields(buf):
            if fno == 1:
                e.ticket = Ticket.decode(bytes(v))
            elif fno == 2:
                e.locations.append(Location.decode(bytes(v)))
        return e


@dataclass
class FlightInfo:
    """schema = encapsulated IPC schema message bytes."""
    schema: bytes = b""
    descriptor: FlightDescriptor = field(default_factory=FlightDescriptor)
    endpoints: List[FlightEndpoint] = field(default_factory=list)
    total_records: int = -1
    total_bytes: int = -1

    def encode(self) -> bytes:
        out = b""
        if self.schema:
            out += _ld(1, self.schema)
        out += _ld(2, self.descriptor.encode())
        for ep in self.endpoints:
            out += _ld(3, ep.encode())
        out += _vi(4, self.total_records & ((1 << 64) - 1)
                   if self.total_records else 0)
        out += _vi(5, self.total_bytes & ((1 << 64) - 1)
                   if self.total_bytes else 0)
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "FlightInfo":
        fi = cls(total_records=0, total_bytes=0)
        for fno, _, v in _fields(buf):
            if fno == 1:
                fi.schema = bytes(v)
            elif fno == 2:
                fi.descriptor = FlightDescriptor.decode(bytes(v))
            elif fno == 3:
                fi.endpoints.append(FlightEndpoint.decode(bytes(v)))
            elif fno == 4:
                fi.total_records = _s64(v)
            elif fno == 5:
                fi.total_bytes = _s64(v)
        return fi


@dataclass
class FlightData:
    """data_header = bare IPC Message flatbuffer; data_body = buffers.
    data_body is field 1000 so it serializes after the small fields."""
    descriptor: Optional[FlightDescriptor] = None
    data_header: bytes = b""
    app_metadata: bytes = b""
    data_body: bytes = b""

    def encode(self) -> bytes:
        out = b""
        if self.descriptor is not None:
            out += _ld(1, self.descriptor.encode())
        if self.data_header:
            out += _ld(2, self.data_header)
        if self.app_metadata:
            out += _ld(3, self.app_metadata)
        if self.data_body:
            out += _ld(1000, self.data_body)
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "FlightData":
        d = cls()
        for fno, _, v in _fields(buf):
            if fno == 1:
                d.descriptor = FlightDescriptor.decode(bytes(v))
            elif fno == 2:
                d.data_header = bytes(v)
            elif fno == 3:
                d.app_metadata = bytes(v)
            elif fno == 1000:
                d.data_body = bytes(v)
        return d


@dataclass
class PutResult:
    app_metadata: bytes = b""

    def encode(self) -> bytes:
        return _ld(1, self.app_metadata) if self.app_metadata else b""

    @classmethod
    def decode(cls, buf: bytes) -> "PutResult":
        m = b""
        for fno, _, v in _fields(buf):
            if fno == 1:
                m = bytes(v)
        return cls(m)


@dataclass
class Action:
    type: str = ""
    body: bytes = b""

    def encode(self) -> bytes:
        out = b""
        if self.type:
            out += _ld(1, self.type.encode())
        if self.body:
            out += _ld(2, self.body)
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "Action":
        a = cls()
        for fno, _, v in _fields(buf):
            if fno == 1:
                a.type = bytes(v).decode()
            elif fno == 2:
                a.body = bytes(v)
        return a


@dataclass
class Result:
    body: bytes = b""

    def encode(self) -> bytes:
        return _ld(1, self.body) if self.body else b""

    @classmethod
    def decode(cls, buf: bytes) -> "Result":
        b = b""
        for fno, _, v in _fields(buf):
            if fno == 1:
                b = bytes(v)
        return cls(b)


@dataclass
class ActionType:
    type: str = ""
    description: str = ""

    def encode(self) -> bytes:
        out = b""
        if self.type:
            out += _ld(1, self.type.encode())
        if self.description:
            out += _ld(2, self.description.encode())
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "ActionType":
        a = cls()
        for fno, _, v in _fields(buf):
            if fno == 1:
                a.type = bytes(v).decode()
            elif fno == 2:
                a.description = bytes(v).decode()
        return a


@dataclass
class Criteria:
    expression: bytes = b""

    def encode(self) -> bytes:
        return _ld(1, self.expression) if self.expression else b""

    @classmethod
    def decode(cls, buf: bytes) -> "Criteria":
        e = b""
        for fno, _, v in _fields(buf):
            if fno == 1:
                e = bytes(v)
        return cls(e)


@dataclass
class Empty:
    def encode(self) -> bytes:
        return b""

    @classmethod
    def decode(cls, buf: bytes) -> "Empty":
        return cls()


@dataclass
class SchemaResult:
    schema: bytes = b""

    def encode(self) -> bytes:
        return _ld(1, self.schema) if self.schema else b""

    @classmethod
    def decode(cls, buf: bytes) -> "SchemaResult":
        s = b""
        for fno, _, v in _fields(buf):
            if fno == 1:
                s = bytes(v)
        return cls(s)


@dataclass
class HandshakeRequest:
    protocol_version: int = 0
    payload: bytes = b""

    def encode(self) -> bytes:
        out = _vi(1, self.protocol_version)
        if self.payload:
            out += _ld(2, self.payload)
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "HandshakeRequest":
        h = cls()
        for fno, _, v in _fields(buf):
            if fno == 1:
                h.protocol_version = v
            elif fno == 2:
                h.payload = bytes(v)
        return h


class HandshakeResponse(HandshakeRequest):
    pass
