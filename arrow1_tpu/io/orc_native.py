"""Native ORC reader (no liborc / pyarrow.orc on the path).

Reference: the reference wraps the ORC C++ library
(cpp/src/arrow/adapters/orc/adapter.cc); this is an original
implementation of the format itself (orc-specification v1):

  layout    PostScript (protobuf, tail) -> Footer -> per-stripe
            StripeFooter -> PRESENT/DATA/LENGTH/DICTIONARY/SECONDARY
            streams. Protobuf decoding rides the same hand-built wire
            reader as Flight (flight_proto._iter_fields).
  codecs    NONE, ZLIB (raw deflate chunks), SNAPPY (native/src),
            ZSTD, LZ4 — ORC chunked framing (3-byte header,
            isOriginal bit)
  encodings Byte-RLE + bit-packed booleans (MSB-first), integer
            RLEv1 and RLEv2 (SHORT_REPEAT / DIRECT / PATCHED_BASE /
            DELTA, big-endian bit packing, FixedBitSizes widths),
            IEEE float/double streams, string DIRECT_V2 and
            DICTIONARY_V2, DATE days, DECIMAL base-128 + scale,
            TIMESTAMP seconds-from-2015 + scaled-nanos SECONDARY
  types     boolean/byte/short/int/long/float/double/string/binary/
            date/decimal/timestamp at arbitrary STRUCT/LIST/MAP
            nesting depth (same recursive assembly idea as the
            Parquet Dremel assembler, but ORC's PRESENT streams make
            it offsets-per-level instead of def/rep reconstruction)

Writer stays delegated (io/orc.py): the read side is what datasets
consume; writing ORC from this engine round-trips through Parquet/IPC.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import dtypes as dt
from ..column import Column, Dictionary
from ..errors import Invalid
from ..flight_proto import _fields as _iter_fields
from ..table import RecordBatch

__all__ = ["read_orc_native"]

# orc_proto.proto CompressionKind
K_NONE, K_ZLIB, K_SNAPPY, K_LZO, K_LZ4, K_ZSTD = range(6)
# Type.Kind
(T_BOOLEAN, T_BYTE, T_SHORT, T_INT, T_LONG, T_FLOAT, T_DOUBLE, T_STRING,
 T_BINARY, T_TIMESTAMP, T_LIST, T_MAP, T_STRUCT, T_UNION, T_DECIMAL,
 T_DATE, T_VARCHAR, T_CHAR, T_TIMESTAMP_INSTANT) = range(19)
# Stream.Kind
(S_PRESENT, S_DATA, S_LENGTH, S_DICTIONARY_DATA, S_DICTIONARY_COUNT,
 S_SECONDARY, S_ROW_INDEX, S_BLOOM_FILTER, S_BLOOM_FILTER_UTF8) = range(9)
# ColumnEncoding.Kind
E_DIRECT, E_DICTIONARY, E_DIRECT_V2, E_DICTIONARY_V2 = range(4)

_ORC_EPOCH_S = 1420070400  # 2015-01-01 UTC (orc spec: timestamp base)


def _msg(buf: bytes) -> Dict[int, list]:
    """Protobuf bytes -> {field: [values]} (repeated-aware)."""
    out: Dict[int, list] = {}
    for fn, wt, val in _iter_fields(buf):
        out.setdefault(fn, []).append(val)
    return out


def _packed_varints(vals: list) -> List[int]:
    """A repeated varint field arrives either as ints (unpacked) or as
    length-delimited packed bytes."""
    out: List[int] = []
    for v in vals:
        if isinstance(v, int):
            out.append(v)
        else:
            pos = 0
            while pos < len(v):
                x = shift = 0
                while True:
                    b = v[pos]
                    pos += 1
                    x |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                out.append(x)
    return out


def _decompress(kind: int, data: bytes) -> bytes:
    """ORC stream framing: NONE = raw; else 3-byte chunk headers
    (length << 1 | isOriginal), each chunk independently compressed."""
    if kind == K_NONE:
        return data
    out = bytearray()
    pos = 0
    while pos + 3 <= len(data):
        h = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
        pos += 3
        ln = h >> 1
        chunk = data[pos: pos + ln]
        pos += ln
        if h & 1:
            out += chunk
        elif kind == K_ZLIB:
            out += zlib.decompress(chunk, -15)
        elif kind == K_ZSTD:
            import zstandard

            out += zstandard.ZstdDecompressor().decompress(
                chunk, max_output_size=1 << 26)
        elif kind == K_SNAPPY:
            from ..native import snappy_decompress

            out += snappy_decompress(chunk)
        elif kind == K_LZ4:
            from ..native import lz4_block_decompress

            out += lz4_block_decompress(chunk, 1 << 26)
        else:
            raise Invalid(f"orc_native: compression kind {kind}")
    return bytes(out)


# ---------------------------------------------------------------------
# primitive decoders
# ---------------------------------------------------------------------

def _byte_rle(data: bytes, n: int) -> np.ndarray:
    """ORC Byte-RLE: control 0..127 = run of c+3 copies of next byte;
    128..255 = 256-c literal bytes."""
    out = np.empty(n, np.uint8)
    pos = filled = 0
    while filled < n:
        c = data[pos]
        pos += 1
        if c < 128:
            run = c + 3
            out[filled: filled + run] = data[pos]
            pos += 1
        else:
            run = 256 - c
            out[filled: filled + run] = np.frombuffer(
                data, np.uint8, run, pos)
            pos += run
        filled += run
    return out


def _bool_rle(data: bytes, n: int) -> np.ndarray:
    """Booleans: byte-RLE over MSB-first bit-packed bytes."""
    nbytes = (n + 7) // 8
    by = _byte_rle(data, nbytes)
    return np.unpackbits(by, bitorder="big")[:n].astype(bool)


_FBS = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
        19, 20, 21, 22, 23, 24, 26, 28, 30, 32, 40, 48, 56, 64]


def _unpack_be(data: bytes, pos: int, width: int, n: int
               ) -> Tuple[np.ndarray, int]:
    """Big-endian MSB-first bit unpack -> (uint64[n], new pos)."""
    if width == 0:
        return np.zeros(n, np.uint64), pos
    nbytes = (n * width + 7) // 8
    raw = np.frombuffer(data, np.uint8, nbytes, pos)
    bits = np.unpackbits(raw, bitorder="big")[: n * width]
    bits = bits.reshape(n, width).astype(np.uint64)
    weights = np.uint64(1) << np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits * weights).sum(axis=1, dtype=np.uint64), pos + nbytes


def _varint_u(data: bytes, pos: int) -> Tuple[int, int]:
    v = shift = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _zz(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _rle_v2(data: bytes, n: int, signed: bool) -> np.ndarray:
    """Integer RLEv2 (orc spec 'Run Length Encoding version 2')."""
    out = np.empty(n, np.int64)
    pos = filled = 0
    while filled < n:
        b0 = data[pos]
        mode = b0 >> 6
        if mode == 0:  # SHORT_REPEAT
            w = ((b0 >> 3) & 0x7) + 1
            run = (b0 & 0x7) + 3
            pos += 1
            v = int.from_bytes(data[pos: pos + w], "big")
            pos += w
            if signed:
                v = _zz(v)
            out[filled: filled + run] = np.int64(
                (v + 2**64) % 2**64 - 2**63 if v >= 2**63 else v)
            filled += run
        elif mode == 1:  # DIRECT
            w = _FBS[(b0 >> 1) & 0x1F]
            ln = ((b0 & 1) << 8 | data[pos + 1]) + 1
            pos += 2
            vals, pos = _unpack_be(data, pos, w, ln)
            iv = vals.view(np.int64)
            if signed:
                iv = ((vals >> np.uint64(1)).view(np.int64)
                      ^ -(vals & np.uint64(1)).view(np.int64))
            out[filled: filled + ln] = iv
            filled += ln
        elif mode == 2:  # PATCHED_BASE
            w = _FBS[(b0 >> 1) & 0x1F]
            ln = ((b0 & 1) << 8 | data[pos + 1]) + 1
            b2, b3 = data[pos + 2], data[pos + 3]
            bw = ((b2 >> 5) & 0x7) + 1
            pw = _FBS[b2 & 0x1F]
            pgw = ((b3 >> 5) & 0x7) + 1
            pll = b3 & 0x1F
            pos += 4
            base = int.from_bytes(data[pos: pos + bw], "big")
            sign_bit = 1 << (bw * 8 - 1)
            if base & sign_bit:  # sign-magnitude
                base = -(base & (sign_bit - 1))
            pos += bw
            vals, pos = _unpack_be(data, pos, w, ln)
            patch_total = pgw * 8 + pw  # hmm: gap+patch packed together
            pwidth = ((pgw * 8 + pw + 7) // 8) * 8
            patches, pos = _unpack_be(data, pos, pwidth, pll)
            vals = vals.copy()
            gap_acc = 0
            for p in patches:
                p = int(p)
                gap = p >> pw
                patch = p & ((1 << pw) - 1)
                gap_acc += gap
                vals[gap_acc] |= np.uint64(patch << w)
            out[filled: filled + ln] = base + vals.view(np.int64)
            filled += ln
        else:  # DELTA
            code = (b0 >> 1) & 0x1F
            w = 0 if code == 0 else _FBS[code]
            ln = ((b0 & 1) << 8 | data[pos + 1]) + 1
            pos += 2
            base, pos = _varint_u(data, pos)
            base = _zz(base) if signed else base
            delta0, pos = _varint_u(data, pos)
            delta0 = _zz(delta0)
            seq = np.empty(ln, np.int64)
            seq[0] = base
            if ln > 1:
                seq[1] = base + delta0
                if ln > 2:
                    if w:
                        deltas, pos = _unpack_be(data, pos, w, ln - 2)
                        d = deltas.view(np.int64) * (1 if delta0 >= 0
                                                     else -1)
                    else:
                        d = np.full(ln - 2, delta0, np.int64)
                    seq[2:] = (base + delta0) + np.cumsum(d)
            out[filled: filled + ln] = seq
            filled += ln
    return out


def _rle_v1(data: bytes, n: int, signed: bool) -> np.ndarray:
    """Integer RLEv1: control 0..127 = run of c+3 with signed-byte delta;
    128..255 = 256-c literal varints."""
    out = np.empty(n, np.int64)
    pos = filled = 0
    while filled < n:
        c = data[pos]
        pos += 1
        if c < 128:
            run = c + 3
            delta = data[pos]
            delta = delta - 256 if delta >= 128 else delta
            pos += 1
            v, pos = _varint_u(data, pos)
            if signed:
                v = _zz(v)
            elif v >= (1 << 63):
                v -= 1 << 64       # two's-complement wrap
            out[filled: filled + run] = v + delta * np.arange(run)
            filled += run
        else:
            run = 256 - c
            for i in range(run):
                v, pos = _varint_u(data, pos)
                if signed:
                    v = _zz(v)
                elif v >= (1 << 63):
                    v -= 1 << 64   # two's-complement wrap (liborc
                    # casts int64 nanos through uint64)
                out[filled + i] = v
            filled += run
    return out


def _decimal_data(data: bytes, n: int) -> np.ndarray:
    """DECIMAL DATA stream: n signed base-128 varints -> object ints."""
    out = np.empty(n, object)
    pos = 0
    for i in range(n):
        v, pos = _varint_u(data, pos)
        out[i] = _zz(v)
    return out


# ---------------------------------------------------------------------
# schema + column assembly
# ---------------------------------------------------------------------

class _Type:
    __slots__ = ("kind", "subtypes", "names", "precision", "scale")

    def __init__(self, kind, subtypes, names, precision, scale):
        self.kind = kind
        self.subtypes = subtypes
        self.names = names
        self.precision = precision
        self.scale = scale


def _parse_types(footer: Dict) -> List[_Type]:
    types = []
    for raw in footer.get(4, []):
        m = _msg(raw)
        types.append(_Type(
            m.get(1, [0])[0], _packed_varints(m.get(2, [])),
            [x.decode() for x in m.get(3, [])],
            m.get(5, [38])[0], m.get(6, [0])[0]))
    return types


class _Stripe:
    def __init__(self, buf, comp, info, types):
        m = _msg(info)
        self.offset = m.get(1, [0])[0]
        self.index_len = m.get(2, [0])[0]
        self.data_len = m.get(3, [0])[0]
        self.footer_len = m.get(4, [0])[0]
        self.num_rows = m.get(5, [0])[0]
        sf_raw = _decompress(comp, buf[
            self.offset + self.index_len + self.data_len:
            self.offset + self.index_len + self.data_len
            + self.footer_len])
        sf = _msg(sf_raw)
        self.encodings = []
        for raw in sf.get(2, []):
            em = _msg(raw)
            self.encodings.append((em.get(1, [0])[0], em.get(2, [0])[0]))
        # stream layout: sequential from offset, index streams first
        self.streams: Dict[Tuple[int, int], bytes] = {}
        pos = self.offset
        for raw in sf.get(1, []):
            sm = _msg(raw)
            kind = sm.get(1, [0])[0]
            col = sm.get(2, [0])[0]
            ln = sm.get(3, [0])[0]
            self.streams[(col, kind)] = buf[pos: pos + ln]
            pos += ln

    def stream(self, col: int, kind: int, comp: int) -> Optional[bytes]:
        raw = self.streams.get((col, kind))
        return None if raw is None else _decompress(comp, raw)


def _present(stripe: _Stripe, col: int, comp: int, n: int
             ) -> Optional[np.ndarray]:
    raw = stripe.stream(col, S_PRESENT, comp)
    if raw is None:
        return None
    return _bool_rle(raw, n)


def _expand(vals, present: Optional[np.ndarray], n: int):
    """Non-null-compacted values -> slot-aligned (zeros where null)."""
    if present is None:
        return vals
    if isinstance(vals, np.ndarray) and vals.dtype == object:
        out = np.zeros(n, object)
    else:
        out = np.zeros(n, vals.dtype)
    out[present] = vals
    return out


def _expand_column(col, present: Optional[np.ndarray], n: int):
    """Expand a column decoded at parent-non-null granularity back to
    the parent's n slots (absent slots: zero/null)."""
    import jax.numpy as jnp

    from ..column import ListColumn, StructColumn

    if present is None:
        return col
    pj = jnp.asarray(present)
    if isinstance(col, StructColumn):
        kids = tuple(_expand_column(c, present, n) for c in col.children)
        validity = jnp.zeros(n, jnp.bool_).at[
            jnp.flatnonzero(pj, size=int(present.sum()))].set(
            col.mask() if col.validity is not None
            else jnp.ones(int(present.sum()), jnp.bool_))
        return StructColumn(kids, col.names, col.dtype,
                            validity=validity)
    if isinstance(col, ListColumn):
        lengths = np.zeros(n, np.int64)
        lengths[present] = np.asarray(col.value_lengths())
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(lengths, out=offsets[1:])
        validity = np.zeros(n, bool)
        validity[present] = (np.asarray(col.validity)
                             if col.validity is not None
                             else True)
        return ListColumn(jnp.asarray(offsets), col.values, col.dtype,
                          validity=jnp.asarray(validity))
    data = np.zeros((n,) + col.data.shape[1:],
                    np.asarray(col.data).dtype)
    data[present] = np.asarray(col.data)
    validity = np.zeros(n, bool)
    validity[present] = (np.asarray(col.validity)
                         if col.validity is not None else True)
    kw = {}
    if col.data2 is not None:
        d2 = np.zeros((n,) + col.data2.shape[1:],
                      np.asarray(col.data2).dtype)
        d2[present] = np.asarray(col.data2)
        kw["data2"] = jnp.asarray(d2)
    if col.bits is not None:
        b = np.zeros(n, np.asarray(col.bits).dtype)
        b[present] = np.asarray(col.bits)
        kw["bits"] = jnp.asarray(b)
    return Column(jnp.asarray(data), col.dtype,
                  validity=jnp.asarray(validity),
                  dictionary=col.dictionary, **kw)


def _decode_column(stripe: _Stripe, types: List[_Type], col: int,
                   comp: int, n: int):
    """-> engine column for `col` with n value slots."""
    import jax.numpy as jnp

    from ..column import ListColumn, StructColumn

    t = types[col]
    enc, dict_size = stripe.encodings[col]
    present = _present(stripe, col, comp, n)
    nv = int(present.sum()) if present is not None else n
    validity = None if present is None else jnp.asarray(present)

    def data(kind=S_DATA):
        return stripe.stream(col, kind, comp)

    def ints(signed=True, kind=S_DATA, count=nv):
        raw = data(kind)
        if raw is None or count == 0:
            return np.zeros(count, np.int64)
        if enc in (E_DIRECT_V2, E_DICTIONARY_V2):
            return _rle_v2(raw, count, signed)
        return _rle_v1(raw, count, signed)

    if t.kind == T_STRUCT:
        # child streams cover only the parent's NON-NULL slots — decode
        # at nv, then expand back to the parent's n slots
        children, names = [], []
        for sub, name in zip(t.subtypes, t.names):
            child = _decode_column(stripe, types, sub, comp, nv)
            children.append(_expand_column(child, present, n))
            names.append(name)
        fields = [(nm, c.dtype) for nm, c in zip(names, children)]
        return StructColumn(tuple(children), tuple(names),
                            dt.struct(fields), validity=validity)
    if t.kind in (T_LIST, T_MAP):
        lengths = _expand(ints(signed=False, kind=S_LENGTH), present, n)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(lengths, out=offsets[1:])
        total = int(offsets[-1])
        if t.kind == T_LIST:
            child = _decode_column(stripe, types, t.subtypes[0], comp,
                                   total)
            return ListColumn(jnp.asarray(offsets), child,
                              dt.list_(child.dtype), validity=validity)
        key = _decode_column(stripe, types, t.subtypes[0], comp, total)
        val = _decode_column(stripe, types, t.subtypes[1], comp, total)
        child = RecordBatch((key, val), ("key", "value"))
        return ListColumn(jnp.asarray(offsets), child,
                          dt.map_(key.dtype, val.dtype),
                          validity=validity)
    if t.kind == T_BOOLEAN:
        raw = data()
        vals = _bool_rle(raw, nv) if raw is not None else np.zeros(
            nv, bool)
        return Column(jnp.asarray(_expand(vals, present, n)), dt.bool_,
                      validity=validity)
    if t.kind == T_BYTE:
        vals = _byte_rle(data(), nv).view(np.int8) if nv else np.zeros(
            0, np.int8)
        return Column(jnp.asarray(_expand(vals, present, n)), dt.int8,
                      validity=validity)
    if t.kind in (T_SHORT, T_INT, T_LONG):
        vals = ints()
        typ = {T_SHORT: dt.int16, T_INT: dt.int32, T_LONG: dt.int64}[
            t.kind]
        vals = vals.astype(typ.physical_dtype())
        return Column(jnp.asarray(_expand(vals, present, n)), typ,
                      validity=validity)
    if t.kind in (T_FLOAT, T_DOUBLE):
        npdt = np.float32 if t.kind == T_FLOAT else np.float64
        raw = data() or b""
        vals = np.frombuffer(raw, npdt, nv)
        out = _expand(vals, present, n)
        typ = dt.float32 if t.kind == T_FLOAT else dt.float64
        bits = None
        if t.kind == T_DOUBLE:
            bits = jnp.asarray(np.ascontiguousarray(out).view(np.int64))
        return Column(jnp.asarray(out), typ, validity=validity,
                      bits=bits)
    if t.kind == T_DATE:
        vals = ints().astype(np.int32)
        return Column(jnp.asarray(_expand(vals, present, n)), dt.date32,
                      validity=validity)
    if t.kind in (T_TIMESTAMP, T_TIMESTAMP_INSTANT):
        secs = ints()
        nanos_enc = ints(signed=False, kind=S_SECONDARY)
        code = nanos_enc & 0x7  # trailing-zero count code (spec)
        base = nanos_enc >> 3
        nanos = np.where(code == 0, base, base * 10 ** (code + 1))
        # nanos may be NEGATIVE pre-1970: liborc splits trunc-toward-
        # zero seconds + signed remainder (cast through uint64), not
        # the spec's floor + [0, 1e9) nanos; // floors both exactly
        us = (secs + _ORC_EPOCH_S) * 10**6 + nanos // 1000
        return Column(jnp.asarray(_expand(us, present, n)),
                      dt.timestamp("us"), validity=validity)
    if t.kind == T_DECIMAL:
        ints_o = _decimal_data(data() or b"", nv)
        scale = ints(signed=True, kind=S_SECONDARY)
        # scale stream repeats the column scale per value; the column's
        # declared scale governs the logical type
        unscaled = np.zeros(n, object)
        unscaled[present if present is not None
                 else np.ones(n, bool)] = [
            int(v) * 10 ** int(t.scale - s)
            for v, s in zip(ints_o, scale)]
        lo = np.array([int(v) & (2**64 - 1) for v in unscaled],
                      np.uint64).view(np.int64)
        hi = np.array([int(v) >> 64 for v in unscaled], np.int64)
        return Column(jnp.asarray(lo),
                      dt.decimal128(t.precision, t.scale),
                      validity=validity, data2=jnp.asarray(hi))
    if t.kind == T_UNION:
        # DATA = byte-RLE tags over the parent's non-null rows; child i
        # covers exactly the rows tagged i, in row order. The reference
        # adapter surfaces ORC unions as SPARSE unions with children
        # named _union_<i> (verified against pyarrow.orc read-back), so
        # children expand to full length with nulls off-tag. Parent
        # PRESENT nulls (only foreign writers emit them — arrow unions
        # carry no top-level validity) land as tag-0 rows whose child
        # slot is null.
        from ..column import UnionColumn

        raw = data()
        tags = (_byte_rle(raw, nv) if raw is not None
                else np.zeros(nv, np.uint8))
        pres = present if present is not None else np.ones(n, bool)
        tags_full = np.zeros(n, np.uint8)
        tags_full[pres] = tags
        kids = []
        fields = []
        for i, sub in enumerate(t.subtypes):
            mask_i = np.zeros(n, bool)
            mask_i[pres] = tags == i
            cnt = int(mask_i.sum())
            child = _decode_column(stripe, types, sub, comp, cnt)
            kids.append(_expand_column(
                child, None if cnt == n else mask_i, n))
            fields.append((f"_union_{i}", kids[-1].dtype))
        return UnionColumn(jnp.asarray(tags_full.astype(np.int8)),
                           tuple(kids), dt.sparse_union(fields))
    if t.kind in (T_STRING, T_VARCHAR, T_CHAR, T_BINARY):
        typ = dt.binary if t.kind == T_BINARY else dt.string
        if enc in (E_DICTIONARY, E_DICTIONARY_V2):
            codes = ints(signed=False, kind=S_DATA).astype(np.int64)
            lens = stripe.stream(col, S_LENGTH, comp)
            lengths = (_rle_v2(lens, dict_size, False)
                       if enc == E_DICTIONARY_V2
                       else _rle_v1(lens, dict_size, False))
            blob = stripe.stream(col, S_DICTIONARY_DATA, comp) or b""
            offs = np.zeros(dict_size + 1, np.int64)
            np.cumsum(lengths, out=offs[1:])
            vals_u = [blob[offs[i]: offs[i + 1]]
                      for i in range(dict_size)]
            if typ.is_string:
                vals_u = [v.decode("utf8") for v in vals_u]
            codes_full = _expand(codes, present, n).astype(np.int32)
            uniq = np.asarray(vals_u if vals_u else [""], object)
            return Column(jnp.asarray(codes_full), typ,
                          validity=validity,
                          dictionary=Dictionary(uniq))
        lengths = ints(signed=False, kind=S_LENGTH)
        blob = data() or b""
        offs = np.zeros(nv + 1, np.int64)
        np.cumsum(lengths, out=offs[1:])
        vals = [blob[offs[i]: offs[i + 1]] for i in range(nv)]
        if typ.is_string:
            vals = [v.decode("utf8") for v in vals]
        uniq, codes = (np.unique(np.asarray(vals, object),
                                 return_inverse=True)
                       if vals else (np.asarray([""], object),
                                     np.zeros(0, np.int64)))
        codes_full = _expand(codes, present, n).astype(np.int32)
        return Column(jnp.asarray(codes_full), typ, validity=validity,
                      dictionary=Dictionary(uniq))
    raise Invalid(f"orc_native: type kind {t.kind}")


def read_orc_native(buf: bytes, columns=None) -> RecordBatch:
    if len(buf) < 4 or not buf.startswith(b"ORC"):
        # ORC files start with the "ORC" magic header
        raise Invalid("orc_native: bad magic")
    ps_len = buf[-1]
    ps = _msg(buf[-1 - ps_len: -1])
    footer_len = ps.get(1, [0])[0]
    comp = ps.get(2, [K_NONE])[0]
    footer = _msg(_decompress(
        comp, buf[-1 - ps_len - footer_len: -1 - ps_len]))
    types = _parse_types(footer)
    if not types or types[0].kind != T_STRUCT:
        raise Invalid("orc_native: root is not a struct")
    root = types[0]
    want = columns if columns is not None else root.names
    batches: List[List] = []
    for raw in footer.get(3, []):
        stripe = _Stripe(buf, comp, raw, types)
        n = stripe.num_rows
        cols = []
        for name in want:
            i = root.names.index(name)
            cols.append(_decode_column(stripe, types,
                                       root.subtypes[i], comp, n))
        batches.append(cols)
    if not batches:
        # empty file: zero-row columns of the right types
        stripe = None
        raise Invalid("orc_native: no stripes")  # caller falls back
    if len(batches) == 1:
        return RecordBatch(tuple(batches[0]), tuple(want))
    from ..table import Table

    tbls = [RecordBatch(tuple(b), tuple(want)) for b in batches]
    return Table(tbls).combine_chunks()
