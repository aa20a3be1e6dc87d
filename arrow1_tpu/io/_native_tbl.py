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

_NULL, _INT64, _BOOL, _FLOAT64, _STRING = range(5)
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
    The caller owns the handle and must a1t_tbl_free it afterwards."""
    import jax.numpy as jnp

    from .. import dtypes as dt
    from ..column import Column, Dictionary
    from ..errors import Invalid

    err = lib.a1t_tbl_error(h)
    if err:
        raise Invalid(err.decode())
    nrows = lib.a1t_tbl_nrows(h)
    ncols = lib.a1t_tbl_ncols(h)
    cols, names = [], []
    parents = {}   # parent name -> [(child name, Column)]
    for c in range(ncols):
        name = lib.a1t_tbl_col_name(h, c).decode()
        if column_names and c < len(column_names):
            name = column_names[c]
        noffs = lib.a1t_tbl_col_noffsets(h, c)
        parent = (lib.a1t_tbl_col_parent(h, c) or b"").decode()
        ty = lib.a1t_tbl_col_type(h, c)
        if noffs:   # one-level list: elements + offsets + row validity
            offs = np.ctypeslib.as_array(
                lib.a1t_tbl_col_list_offsets(h, c), (noffs,)).copy()
            nelem = int(offs[-1])
            ev = (np.ctypeslib.as_array(
                lib.a1t_tbl_col_elem_valid(h, c), (nelem,)).astype(bool)
                if nelem else np.ones(0, bool))
            child = _flat_column(lib, h, c, nelem, ev, ty)
            rv = (np.ctypeslib.as_array(
                lib.a1t_tbl_col_valid(h, c), (nrows,)).astype(bool)
                if nrows else np.ones(0, bool))
            from ..column import ListColumn

            col = ListColumn(
                jnp.asarray(offs), child, dt.list_(child.dtype),
                validity=None if rv.all() else jnp.asarray(rv))
            cols.append(col)
            names.append(name)
            continue
        valid = (np.ctypeslib.as_array(
            lib.a1t_tbl_col_valid(h, c), (nrows,)).astype(bool)
            if nrows else np.ones(0, bool))
        col = _flat_column(lib, h, c, nrows, valid, ty)
        if parent:
            # strip the parent prefix exactly (parent keys may contain dots)
            child_name = name[len(parent) + 1:] \
                if name.startswith(parent + ".") else name
            parents.setdefault(parent, []).append((child_name, col))
            continue
        cols.append(col)
        names.append(name)
    # assemble structs at their parent positions (presence columns)
    if parents:
        from ..column import StructColumn

        for i, name in enumerate(names):
            if name in parents and cols[i].dtype == dt.null:
                kids = parents[name]
                presence = cols[i].validity  # None means never null
                fields = [(kn, kc.dtype) for kn, kc in kids]
                cols[i] = StructColumn(
                    tuple(kc for _, kc in kids),
                    tuple(kn for kn, _ in kids),
                    dt.struct(fields), validity=presence)
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
