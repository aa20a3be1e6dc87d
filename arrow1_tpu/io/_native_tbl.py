"""Shared ctypes surface for native columnar file readers (CSV, JSON).

The C side (native/src/table_result.h) fills one Result per parse:
typed per-column vectors with strings dictionary-encoded at parse time.
`result_to_batch` converts a handle into an engine RecordBatch
zero-copy-ish (one host copy into device arrays, as ingest must)."""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from ..table import RecordBatch

(_NULL, _INT64, _BOOL, _FLOAT64, _STRING, _LIST,
 _DATE32, _TS_S, _TS_NS) = range(9)
_sigs_done = False


def tbl_lib():
    global _sigs_done
    from ..native import load_library

    lib = load_library()
    if lib is None:
        return None
    if not _sigs_done:
        c = ctypes
        lib.a1t_csv_parse.restype = c.c_void_p
        lib.a1t_csv_parse.argtypes = [
            c.c_char_p, c.c_int64, c.c_char, c.c_char, c.c_int, c.c_int64,
            c.c_int]
        lib.a1t_json_parse.restype = c.c_void_p
        lib.a1t_json_parse.argtypes = [c.c_char_p, c.c_int64, c.c_int]
        lib.a1t_tbl_error.restype = c.c_char_p
        lib.a1t_tbl_error.argtypes = [c.c_void_p]
        for fn, res in [("a1t_tbl_nrows", c.c_int64),
                        ("a1t_tbl_ncols", c.c_int32)]:
            getattr(lib, fn).restype = res
            getattr(lib, fn).argtypes = [c.c_void_p]
        for fn, res in [("a1t_tbl_col_name", c.c_char_p),
                        ("a1t_tbl_col_type", c.c_int32),
                        ("a1t_tbl_col_i64", c.POINTER(c.c_int64)),
                        ("a1t_tbl_col_f64", c.POINTER(c.c_double)),
                        ("a1t_tbl_col_bool", c.POINTER(c.c_uint8)),
                        ("a1t_tbl_col_codes", c.POINTER(c.c_int32)),
                        ("a1t_tbl_col_nuniq", c.c_int32),
                        ("a1t_tbl_col_offsets", c.POINTER(c.c_int32)),
                        ("a1t_tbl_col_bytes", c.POINTER(c.c_char)),
                        ("a1t_tbl_col_nbytes", c.c_int64),
                        ("a1t_tbl_col_valid", c.POINTER(c.c_uint8)),
                        ("a1t_tbl_col_noffsets", c.c_int64),
                        ("a1t_tbl_col_list_offsets",
                         c.POINTER(c.c_int64)),
                        ("a1t_tbl_col_elem_valid", c.POINTER(c.c_uint8)),
                        ("a1t_tbl_col_parent", c.c_char_p)]:
            getattr(lib, fn).restype = res
            getattr(lib, fn).argtypes = [c.c_void_p, c.c_int32]
        lib.a1t_tbl_free.argtypes = [c.c_void_p]
        _sigs_done = True
    return lib


def result_to_batch(lib, h, column_names=None) -> RecordBatch:
    """Consume a native Result handle into an engine RecordBatch.
    The caller owns the handle and must a1t_tbl_free it afterwards.

    Columns form a TREE via parent links (arbitrary nesting depth):
    T_LIST nodes carry offsets and one "<name>.$" element child;
    T_NULL presence nodes with children are structs."""
    import jax.numpy as jnp

    from .. import dtypes as dt
    from ..column import ListColumn, StructColumn
    from ..errors import Invalid

    err = lib.a1t_tbl_error(h)
    if err:
        raise Invalid(err.decode())
    nrows = lib.a1t_tbl_nrows(h)
    ncols = lib.a1t_tbl_ncols(h)
    meta = []
    children = {}   # parent name -> [column indices]
    for c in range(ncols):
        name = lib.a1t_tbl_col_name(h, c).decode()
        parent = (lib.a1t_tbl_col_parent(h, c) or b"").decode()
        ty = lib.a1t_tbl_col_type(h, c)
        meta.append((name, parent, ty))
        if parent:
            children.setdefault(parent, []).append(c)

    def valid_of(c, count):
        if not count:
            return np.ones(0, bool)
        return np.ctypeslib.as_array(
            lib.a1t_tbl_col_valid(h, c), (count,)).astype(bool)

    def build(c, count):
        name, _, ty = meta[c]
        kids = children.get(name)
        if ty == _LIST:
            noffs = lib.a1t_tbl_col_noffsets(h, c)
            offs = np.ctypeslib.as_array(
                lib.a1t_tbl_col_list_offsets(h, c), (noffs,)).copy()
            nelem = int(offs[-1]) if noffs else 0
            child = build(kids[0], nelem)
            rv = valid_of(c, count)
            return ListColumn(
                jnp.asarray(offs), child, dt.list_(child.dtype),
                validity=None if rv.all() else jnp.asarray(rv))
        if ty == _NULL and kids:
            presence = valid_of(c, count)
            pairs = []
            for k in kids:
                kname = meta[k][0]
                short = kname[len(name) + 1:] \
                    if kname.startswith(name + ".") else kname
                pairs.append((short, build(k, count)))
            fields = [(kn, kc.dtype) for kn, kc in pairs]
            return StructColumn(
                tuple(kc for _, kc in pairs),
                tuple(kn for kn, _ in pairs), dt.struct(fields),
                validity=None if presence.all()
                else jnp.asarray(presence))
        return _flat_column(lib, h, c, count, valid_of(c, count), ty)

    cols, names = [], []
    top = 0
    for c in range(ncols):
        name, parent, _ = meta[c]
        if parent:
            continue
        if column_names and top < len(column_names):
            name = column_names[top]
        top += 1
        cols.append(build(c, nrows))
        names.append(name)
    return RecordBatch(tuple(cols), tuple(names))


def _flat_column(lib, h, c, nrows, valid, ty):
    import jax.numpy as jnp

    from .. import dtypes as dt
    from ..column import Column, Dictionary

    validity = None if valid.all() else jnp.asarray(valid)
    if ty == _INT64:
        arr = np.ctypeslib.as_array(
            lib.a1t_tbl_col_i64(h, c), (nrows,)).copy()
        col = Column(jnp.asarray(arr), dt.int64, validity=validity)
    elif ty in (_DATE32, _TS_S, _TS_NS):
        # CSV inference promotions; values ride the i64 buffer
        arr = np.ctypeslib.as_array(
            lib.a1t_tbl_col_i64(h, c), (nrows,)).copy()
        if ty == _DATE32:
            col = Column(jnp.asarray(arr.astype(np.int32)), dt.date32,
                         validity=validity)
        else:
            unit = "s" if ty == _TS_S else "ns"
            col = Column(jnp.asarray(arr), dt.timestamp(unit),
                         validity=validity)
    elif ty == _FLOAT64:
        arr = np.ctypeslib.as_array(
            lib.a1t_tbl_col_f64(h, c), (nrows,)).copy()
        col = Column(jnp.asarray(arr), dt.float64, validity=validity,
                     bits=jnp.asarray(arr.view(np.int64)))
    elif ty == _BOOL:
        arr = np.ctypeslib.as_array(
            lib.a1t_tbl_col_bool(h, c), (nrows,)).astype(bool)
        col = Column(jnp.asarray(arr), dt.bool_, validity=validity)
    elif ty == _NULL:
        # validity carries struct presence for parent columns;
        # plain all-null columns arrive with valid all-false
        col = Column(jnp.zeros(nrows, jnp.int8), dt.null,
                     validity=validity)
    else:  # string: parser already dictionary-encoded
        nuniq = lib.a1t_tbl_col_nuniq(h, c)
        offs = np.ctypeslib.as_array(
            lib.a1t_tbl_col_offsets(h, c), (nuniq + 1,))
        nb = lib.a1t_tbl_col_nbytes(h, c)
        raw = (ctypes.string_at(lib.a1t_tbl_col_bytes(h, c), nb)
               if nb else b"")
        try:
            # bulk value-pool decode (host-side utility, not on the
            # parse path; ~20x over a python loop at high
            # cardinality)
            import pyarrow as pa

            uniq = pa.Array.from_buffers(
                pa.utf8(), nuniq,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(raw)]).to_numpy(zero_copy_only=False)
        except Exception:
            uniq = np.asarray(
                [raw[offs[i]: offs[i + 1]].decode("utf8")
                 for i in range(nuniq)], object)
        codes = (np.ctypeslib.as_array(
            lib.a1t_tbl_col_codes(h, c), (nrows,)).copy()
            if nrows else np.zeros(0, np.int32))
        if not nuniq:
            uniq = np.asarray([""], object)
        col = Column(jnp.asarray(codes), dt.string, validity=validity,
                     dictionary=Dictionary(uniq))
    return col
