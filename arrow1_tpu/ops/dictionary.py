"""Dictionary utilities: unification and re-encoding.

Reference: cpp/src/arrow/array/array_dict.cc DictionaryUnifier — merging
per-batch dictionaries into one pool and remapping codes. Host-side (the
dictionaries live on the host); the code remap itself is a device gather.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .. import dtypes as dt
from ..column import Column, Dictionary
from ..errors import Invalid
from ..registry import register_function

__all__ = ["unify_dictionaries", "reencode_against"]


def unify_dictionaries(cols: Sequence[Column]) -> Tuple[jnp.ndarray, Dictionary]:
    """Merge the dictionaries of several dict-encoded columns and return the
    concatenated remapped codes + the unified Dictionary."""
    pool: dict = {}
    values: List = []
    remaps = []
    for c in cols:
        assert c.dictionary is not None
        remap = np.empty(len(c.dictionary), dtype=np.int32)
        for code, v in enumerate(c.dictionary.values.tolist()):
            if v not in pool:
                pool[v] = len(values)
                values.append(v)
            remap[code] = pool[v]
        remaps.append(remap)
    unified = Dictionary(np.array(values, dtype=object))
    parts = []
    for c, remap in zip(cols, remaps):
        if len(remap) == 0:
            parts.append(c.data)
        else:
            parts.append(jnp.asarray(remap)[c.data])
    return jnp.concatenate(parts), unified


def reencode_against(col: Column, target: Dictionary) -> Column:
    """Re-encode a dict column's codes against a target dictionary. Values
    missing from the target raise (callers unify first)."""
    assert col.dictionary is not None
    if col.dictionary is target:
        return col
    idx = target.index
    remap = np.array([idx[v] for v in col.dictionary.values.tolist()],
                     dtype=np.int32)
    data = jnp.asarray(remap)[col.data] if len(remap) else col.data
    return Column(data, col.dtype, validity=col.validity, dictionary=target)


def _dictionary_decode_exec(args, options, ctx):
    """Inverse of dictionary_encode (reference: dictionary_decode in
    vector_hash.cc era). Explicit dictionary columns decode to their
    value type; engine string columns (always code-backed) are already
    logically decoded — returned with the plain string type."""
    (col,) = args
    t = col.dtype
    if t.is_dictionary:
        vt = t.value_type
        return Column(col.data, vt, validity=col.validity,
                      dictionary=col.dictionary)
    # non-dictionary input passes through unchanged (pa parity)
    return col


register_function("dictionary_decode", "vector", 1)(_dictionary_decode_exec)
