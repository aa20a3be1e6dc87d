"""Native ORC writer (no liborc / pyarrow.orc on the path).

Reference: the reference delegates writing to the ORC C++ library
(cpp/src/arrow/adapters/orc/adapter.cc ORCFileWriter); this emits the
format directly (orc-specification v1), the mirror of io/orc_native.py:

  layout     "ORC" magic -> per-stripe [data streams, StripeFooter] ->
             Footer -> PostScript -> postscript length byte. Row
             indexes are omitted (rowIndexStride = 0) and streams are
             uncompressed (CompressionKind NONE) — both spec-legal and
             accepted by liborc and by the native reader.
  encodings  integer RLEv1 (runs + literals), Byte-RLE, bit-packed
             boolean RLE, IEEE float/double streams, string/binary
             DIRECT (LENGTH RLEv1 + concatenated DATA), DATE days,
             TIMESTAMP seconds-from-2015 + SECONDARY nanos (shifted,
             zero trailing-zero code), DECIMAL zigzag base-128 +
             SECONDARY scale, PRESENT bool-RLE for nulls, and
             STRUCT/LIST/MAP nesting (children encode the parent's
             non-null slots, per spec).

Protobuf messages are built with the same hand-rolled wire helpers the
Flight transport uses (flight_proto). Oracle coverage: pyarrow.orc
reads these files byte-for-value equal (tests/test_orc_native.py).
"""

from __future__ import annotations

from typing import List, Tuple, Union

import numpy as np

from .. import dtypes as dt
from ..column import Column, ListColumn, StructColumn, UnionColumn
from ..errors import Invalid
from ..flight_proto import _ld, _varint, _vi


def _vi0(fieldno: int, value: int) -> bytes:
    """Varint field with EXPLICIT zero (liborc requires e.g. the
    PostScript compression field to be present even when NONE=0)."""
    return _varint(fieldno << 3 | 0) + _varint(value)
from ..table import RecordBatch, Table
from .orc_native import (_ORC_EPOCH_S, E_DIRECT, K_NONE, S_DATA,
                         S_LENGTH, S_PRESENT, S_SECONDARY, T_BINARY,
                         T_BOOLEAN, T_BYTE, T_DATE, T_DECIMAL, T_DOUBLE,
                         T_FLOAT, T_INT, T_LIST, T_LONG, T_MAP, T_SHORT,
                         T_STRING, T_STRUCT, T_TIMESTAMP, T_UNION)

__all__ = ["write_orc_native"]


# ---------------------------------------------------------------------
# primitive encoders (inverses of orc_native's decoders)
# ---------------------------------------------------------------------

def _enc_varint_u(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_zz(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else (v << 1)


def _byte_rle_write(data: bytes) -> bytes:
    """Byte-RLE: runs of 3..130 equal bytes, literal chunks of <=128."""
    out = bytearray()
    n = len(data)
    i = 0
    lit_start = i
    while i < n:
        run = 1
        while i + run < n and run < 130 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            while lit_start < i:
                chunk = min(128, i - lit_start)
                out.append(256 - chunk)
                out += data[lit_start: lit_start + chunk]
                lit_start += chunk
            out.append(run - 3)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    while lit_start < n:
        chunk = min(128, n - lit_start)
        out.append(256 - chunk)
        out += data[lit_start: lit_start + chunk]
        lit_start += chunk
    return bytes(out)


def _bool_rle_write(bits: np.ndarray) -> bytes:
    by = np.packbits(bits.astype(bool), bitorder="big")
    return _byte_rle_write(by.tobytes())


def _rle_v1_write(vals, signed: bool) -> bytes:
    """Integer RLEv1: constant runs of 3..130 (delta 0), else literal
    groups of <=128 varints. vals: numpy int array or object ints."""
    out = bytearray()
    n = len(vals)

    def varint(x) -> bytes:
        x = int(x)
        if signed:
            x = _enc_zz(x)
        else:
            x &= (1 << 64) - 1   # two's-complement for e.g. negative
            # timestamp nanos (liborc casts int64 through uint64)
        return _enc_varint_u(x)

    i = 0
    lit: List[int] = []

    def flush_lit():
        j = 0
        while j < len(lit):
            chunk = lit[j: j + 128]
            out.append(256 - len(chunk))
            for v in chunk:
                out.extend(varint(v))
            j += 128
        lit.clear()

    arr = np.asarray(vals)
    while i < n:
        run = 1
        while i + run < n and run < 130 and arr[i + run] == arr[i]:
            run += 1
        if run >= 3:
            flush_lit()
            out.append(run - 3)
            out.append(0)       # delta 0
            out += varint(arr[i])
            i += run
        else:
            lit.extend(int(x) for x in arr[i: i + run])
            i += run
    flush_lit()
    return bytes(out)


# ---------------------------------------------------------------------
# schema flattening (column ids in pre-order, root struct = 0)
# ---------------------------------------------------------------------

def _flatten_types(batch: RecordBatch):
    """-> (types, col_of): ORC Type protobuf payloads in pre-order and
    the per-column root child ids."""
    types: List[bytes] = []

    def visit(t: dt.DataType, col) -> int:
        my = len(types)
        types.append(b"")    # placeholder; filled after children
        k = t.kind
        if k == "bool":
            body = _vi(1, T_BOOLEAN)
        elif k == "int8":
            body = _vi(1, T_BYTE)
        elif k in ("int16", "uint8"):
            body = _vi(1, T_SHORT)
        elif k in ("int32", "uint16"):
            body = _vi(1, T_INT)
        elif k in ("int64", "uint32"):
            body = _vi(1, T_LONG)
        elif k == "float32":
            body = _vi(1, T_FLOAT)
        elif k == "float64":
            body = _vi(1, T_DOUBLE)
        elif k == "string":
            body = _vi(1, T_STRING)
        elif k == "binary":
            body = _vi(1, T_BINARY)
        elif k == "date32":
            body = _vi(1, T_DATE)
        elif k == "timestamp" and t.unit == "us" and not t.tz:
            body = _vi(1, T_TIMESTAMP)
        elif k == "decimal128":
            body = (_vi(1, T_DECIMAL) + _vi(5, t.precision)
                    + _vi(6, t.scale))
        elif k == "list":
            sub = visit(t.fields[0][1], None)
            body = _vi(1, T_LIST) + _vi(2, sub)
        elif k == "map":
            ks = visit(t.fields[0][1], None)
            vs = visit(t.fields[1][1], None)
            body = _vi(1, T_MAP) + _vi(2, ks) + _vi(2, vs)
        elif k == "struct":
            body = _vi(1, T_STRUCT)
            subs = []
            for name, ft in t.fields:
                subs.append(visit(ft, None))
            for s in subs:
                body += _vi(2, s)
            for name, _ in t.fields:
                body += _ld(3, name.encode())
        elif k in ("sparse_union", "dense_union"):
            # ORC unions are tagged (dense on the wire); child type
            # nodes are unnamed (fieldNames is struct-only)
            body = _vi(1, T_UNION)
            subs = [visit(ft, None) for _, ft in t.fields]
            for s in subs:
                body += _vi(2, s)
        else:
            raise Invalid(f"orc write: unsupported type {t}")
        types[my] = body
        return my

    root = _vi(1, T_STRUCT)
    types.append(b"")
    col_of = []
    subs = []
    for name, c in zip(batch.names, batch.columns):
        cid = visit(c.dtype, c)
        col_of.append(cid)
        subs.append(cid)
    for s in subs:
        root += _vi(2, s)
    for name in batch.names:
        root += _ld(3, name.encode())
    types[0] = root
    return types, col_of


# ---------------------------------------------------------------------
# column encoding
# ---------------------------------------------------------------------

class _StripeBuild:
    def __init__(self, n_types: int):
        self.streams: List[Tuple[int, int, bytes]] = []  # (col, kind, raw)
        self.encodings: List[bytes] = [b""] * n_types
        self.counts = [0] * n_types
        self.has_null = [False] * n_types

    def add(self, col: int, kind: int, raw: bytes):
        if raw:
            self.streams.append((col, kind, raw))


def _host_validity(col) -> np.ndarray:
    if col.validity is None:
        return None
    v = np.asarray(col.validity).astype(bool)
    return None if v.all() else v


def _encode_column(col, cid: int, sb: _StripeBuild, n: int,
                   next_id: List[int]):
    """Encode column `col` (n slots) as ORC streams for type node cid.
    Children get ids cid+1.. in pre-order via next_id bookkeeping."""
    t = col.dtype
    sb.encodings[cid] = _vi0(1, E_DIRECT)
    # unions carry no top-level validity (column.py UnionColumn)
    present = (None if isinstance(col, UnionColumn)
               else _host_validity(col))
    sb.counts[cid] = n if present is None else int(present.sum())
    sb.has_null[cid] = present is not None
    if present is not None:
        sb.add(cid, S_PRESENT, _bool_rle_write(present))
        sel = present
    else:
        sel = slice(None)

    if isinstance(col, StructColumn):
        for child in col.children:
            sub = _take_child(child, sel, n, present)
            ccid = next_id[0]
            _encode_column(sub, ccid, sb, sb.counts[cid], [ccid + 1])
            next_id[0] = ccid + _n_nodes(child.dtype)
        return
    if isinstance(col, UnionColumn):
        # DATA = byte-RLE tags (unions carry no top-level validity);
        # child i gets the rows tagged i, in row order
        tags = np.asarray(col.type_ids).astype(np.uint8)
        sb.add(cid, S_DATA, _byte_rle_write(tags.tobytes()))
        offsets = (None if col.offsets is None
                   else np.asarray(col.offsets).astype(np.int64))
        for i, child in enumerate(col.children):
            mask_i = tags == i
            if offsets is None:              # sparse: filter rows
                sub = _take_child(child, None, n, mask_i)
            else:                            # dense: gather child slots
                idx = offsets[mask_i]
                if not isinstance(child, Column):
                    raise Invalid("orc write: dense union with nested "
                                  "children is not supported")
                take = np.zeros(len(child), bool)
                monotone = (np.all(np.diff(idx) > 0)
                            if len(idx) > 1 else True)
                if monotone:
                    take[idx] = True
                    sub = _take_child(child, None, len(child), take)
                else:
                    import jax.numpy as jnp

                    kw = {}
                    if child.validity is not None:
                        kw["validity"] = jnp.asarray(
                            np.asarray(child.validity)[idx])
                    if child.data2 is not None:
                        kw["data2"] = jnp.asarray(
                            np.asarray(child.data2)[idx])
                    if child.bits is not None:
                        kw["bits"] = jnp.asarray(
                            np.asarray(child.bits)[idx])
                    sub = Column(jnp.asarray(np.asarray(child.data)[idx]),
                                 child.dtype, dictionary=child.dictionary,
                                 **kw)
            ccid = next_id[0]
            _encode_column(sub, ccid, sb, int(mask_i.sum()), [ccid + 1])
            next_id[0] = ccid + _n_nodes(child.dtype)
        return
    if isinstance(col, ListColumn):
        offs = np.asarray(col.offsets).astype(np.int64)
        lengths = (offs[1:] - offs[:-1])[sel]
        sb.add(cid, S_LENGTH, _rle_v1_write(lengths, signed=False))
        # child carries ALL values (offsets select); per spec the child
        # stream covers exactly the elements of non-null lists — rebuild
        values = col.values
        if present is not None:
            keep = np.zeros(int(offs[-1]), bool)
            for i in np.flatnonzero(present):
                keep[offs[i]: offs[i + 1]] = True
            values = _take_values(values, keep)
        total = int(lengths.sum())
        if t.kind == "map":
            kv = values   # RecordBatch(key, value)
            kcid = next_id[0]
            _encode_column(kv.columns[0], kcid, sb, total, [kcid + 1])
            vcid = kcid + _n_nodes(kv.columns[0].dtype)
            _encode_column(kv.columns[1], vcid, sb, total, [vcid + 1])
        else:
            ccid = next_id[0]
            _encode_column(values, ccid, sb, total, [ccid + 1])
        return

    data = np.asarray(col.data)
    k = t.kind
    if k == "bool":
        sb.add(cid, S_DATA, _bool_rle_write(data[sel]))
    elif k in ("int8", "uint8"):
        sb.add(cid, S_DATA, _byte_rle_write(
            data[sel].astype(np.uint8).tobytes()))
    elif k in ("int16", "int32", "int64", "uint16", "uint32",
               "date32", "time32", "time64"):
        sb.add(cid, S_DATA, _rle_v1_write(
            data[sel].astype(np.int64), signed=True))
    elif k == "timestamp":
        us = data[sel].astype(np.int64)
        # liborc convention (NOT the spec's floor + [0,1e9) nanos):
        # trunc-toward-zero seconds, SIGNED remainder nanos cast
        # through uint64 -- what liborc itself writes and reads back
        # for pre-1970 values
        secs = (us // 10**6) + ((us % 10**6 != 0) & (us < 0))
        secs = secs - _ORC_EPOCH_S
        rem = us - (secs + _ORC_EPOCH_S) * 10**6
        nanos = rem.astype(np.int64) * 1000
        sb.add(cid, S_DATA, _rle_v1_write(secs, signed=True))
        sb.add(cid, S_SECONDARY, _rle_v1_write(nanos << 3, signed=False))
    elif k == "float32":
        sb.add(cid, S_DATA, data[sel].astype("<f4").tobytes())
    elif k == "float64":
        sb.add(cid, S_DATA, data[sel].astype("<f8").tobytes())
    elif k == "decimal128":
        lo = data[sel].astype(np.int64)
        hi = (np.zeros(len(lo), np.int64) if col.data2 is None
              else np.asarray(col.data2)[sel].astype(np.int64))
        body = bytearray()
        scales = np.full(len(lo), t.scale, np.int64)
        for l_, h_ in zip(lo, hi):
            v = (int(h_) << 64) | (int(l_) & ((1 << 64) - 1))
            body += _enc_varint_u(_enc_zz(v))
        sb.add(cid, S_DATA, bytes(body))
        sb.add(cid, S_SECONDARY, _rle_v1_write(scales, signed=True))
    elif k in ("string", "binary"):
        assert col.dictionary is not None
        pool = col.dictionary.values
        codes = data[sel].astype(np.int64)
        vals = [pool[c] for c in codes]
        raw = [v.encode("utf8") if isinstance(v, str) else bytes(v)
               for v in vals]
        sb.add(cid, S_LENGTH, _rle_v1_write(
            np.asarray([len(r) for r in raw], np.int64), signed=False))
        sb.add(cid, S_DATA, b"".join(raw))
    else:
        raise Invalid(f"orc write: unsupported type {t}")


def _n_nodes(t: dt.DataType) -> int:
    """Type nodes this dtype occupies in pre-order."""
    k = t.kind
    if k in ("list", "map", "struct", "sparse_union", "dense_union"):
        return 1 + sum(_n_nodes(ft) for _, ft in t.fields)
    return 1


def _take_child(child, sel, n: int, present) -> "Column":
    """Child column restricted to the parent's non-null slots."""
    if present is None:
        return child
    if isinstance(child, UnionColumn):
        raise Invalid("orc write: union under a nullable parent is "
                      "not supported")
    if isinstance(child, StructColumn):
        kids = tuple(_take_child(c, sel, n, present)
                     for c in child.children)
        validity = child.validity
        if validity is not None:
            validity = np.asarray(validity)[present]
        import jax.numpy as jnp

        return StructColumn(kids, child.names, child.dtype,
                            validity=None if validity is None
                            else jnp.asarray(validity))
    if isinstance(child, ListColumn):
        import jax.numpy as jnp

        offs = np.asarray(child.offsets).astype(np.int64)
        lens = (offs[1:] - offs[:-1])[present]
        no = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=no[1:])
        keep = np.zeros(int(offs[-1]), bool)
        for i in np.flatnonzero(present):
            keep[offs[i]: offs[i + 1]] = True
        validity = child.validity
        if validity is not None:
            validity = jnp.asarray(np.asarray(validity)[present])
        return ListColumn(jnp.asarray(no),
                          _take_values(child.values, keep),
                          child.dtype, validity=validity)
    import jax.numpy as jnp

    data = np.asarray(child.data)[present]
    kw = {}
    if child.validity is not None:
        kw["validity"] = jnp.asarray(np.asarray(child.validity)[present])
    if child.data2 is not None:
        kw["data2"] = jnp.asarray(np.asarray(child.data2)[present])
    if child.bits is not None:
        kw["bits"] = jnp.asarray(np.asarray(child.bits)[present])
    return Column(jnp.asarray(data), child.dtype,
                  dictionary=child.dictionary, **kw)


def _take_values(values, keep: np.ndarray):
    """List child values restricted to kept flat positions."""
    if isinstance(values, RecordBatch):
        return RecordBatch(tuple(_take_values(c, keep)
                                 for c in values.columns), values.names)
    if isinstance(values, ListColumn):
        import jax.numpy as jnp

        offs = np.asarray(values.offsets).astype(np.int64)
        lens = (offs[1:] - offs[:-1])[keep]
        no = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=no[1:])
        inner = np.zeros(int(offs[-1]), bool)
        for i in np.flatnonzero(keep):
            inner[offs[i]: offs[i + 1]] = True
        validity = values.validity
        if validity is not None:
            validity = jnp.asarray(np.asarray(validity)[keep])
        return ListColumn(jnp.asarray(no),
                          _take_values(values.values, inner),
                          values.dtype, validity=validity)
    if isinstance(values, StructColumn):
        import jax.numpy as jnp

        kids = tuple(_take_values(c, keep) for c in values.children)
        validity = values.validity
        if validity is not None:
            validity = jnp.asarray(np.asarray(validity)[keep])
        return StructColumn(kids, values.names, values.dtype,
                            validity=validity)
    import jax.numpy as jnp

    kw = {}
    if values.validity is not None:
        kw["validity"] = jnp.asarray(np.asarray(values.validity)[keep])
    if values.data2 is not None:
        kw["data2"] = jnp.asarray(np.asarray(values.data2)[keep])
    if values.bits is not None:
        kw["bits"] = jnp.asarray(np.asarray(values.bits)[keep])
    return Column(jnp.asarray(np.asarray(values.data)[keep]),
                  values.dtype, dictionary=values.dictionary, **kw)


# ---------------------------------------------------------------------
# file assembly
# ---------------------------------------------------------------------

def write_orc_native(data: Union[RecordBatch, Table]) -> bytes:
    batches = data.batches if isinstance(data, Table) else [data]
    if not batches:
        raise Invalid("orc write: no batches")
    types, col_of = _flatten_types(batches[0])
    n_types = len(types)

    out = bytearray(b"ORC")
    stripe_infos: List[bytes] = []
    total_rows = 0
    agg_counts = [0] * n_types
    agg_nulls = [False] * n_types
    for batch in batches:
        n = batch.num_rows
        total_rows += n
        sb = _StripeBuild(n_types)
        sb.encodings[0] = _vi0(1, E_DIRECT)
        sb.counts[0] = n
        for c, cid in zip(batch.columns, col_of):
            _encode_column(c, cid, sb, n, [cid + 1])
        offset = len(out)
        data_len = 0
        sf = b""
        for col, kind, raw in sb.streams:
            out += raw
            data_len += len(raw)
            sf += _ld(1, _vi0(1, kind) + _vi0(2, col)
                      + _vi0(3, len(raw)))
        for enc in sb.encodings:
            sf += _ld(2, enc or _vi0(1, E_DIRECT))
        sf += _ld(3, b"UTC")
        out += sf
        stripe_infos.append(
            _vi0(1, offset) + _vi0(2, 0) + _vi0(3, data_len)
            + _vi0(4, len(sf)) + _vi0(5, n))
        for i in range(n_types):
            agg_counts[i] += sb.counts[i]
            agg_nulls[i] = agg_nulls[i] or sb.has_null[i]

    footer = _vi(1, 3) + _vi(2, len(out))
    for si in stripe_infos:
        footer += _ld(3, si)
    for tp in types:
        footer += _ld(4, tp)
    footer += _vi(6, total_rows)
    for cnt, hn in zip(agg_counts, agg_nulls):
        footer += _ld(7, _vi(1, cnt) + (b"\x50\x01" if hn else b"\x50\x00"))
    footer += _vi(8, 0)          # rowIndexStride 0: no row indexes
    out += footer
    ps = (_vi0(1, len(footer)) + _vi0(2, K_NONE) + _vi0(3, 1 << 18)
          + _ld(4, _varint(0) + _varint(12))
          + _vi0(5, 0) + _vi0(6, 1) + _ld(8000, b"ORC"))
    out += ps
    out.append(len(ps))
    return bytes(out)
