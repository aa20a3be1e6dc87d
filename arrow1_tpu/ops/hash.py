"""Vector "hash" kernels: unique, value_counts, dictionary_encode.

Reference: cpp/src/arrow/compute/kernels/vector_hash.cc — MemoTable-driven
actions (:44-230) assigning dense ids in first-appearance order. A serial
memo table is the wrong shape for a TPU; the redesign computes the same
first-appearance semantics from sort-based grouping:

  stable argsort on normalized keys -> adjacent-difference group flags ->
  group representatives (stability makes each group's first sorted element
  its first *occurrence*) -> re-sort representatives by original position
  to recover first-appearance order.

Everything is O(n log n) XLA sort + O(n) scatters — fully parallel, no
data-dependent loops. Output sizes (distinct counts) host-sync at the eager
boundary like the reference's two-phase kernels.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from .. import dtypes as dt
from ..column import Column
from ..errors import Invalid
from ..registry import register_function
from ..table import RecordBatch
from .selection import take_column
from .sort import normalize_sort_key, sort_indices_device

__all__ = ["DictionaryEncodeOptions", "grouping_by_keys"]


@dataclasses.dataclass
class DictionaryEncodeOptions:
    """Reference: api_vector.h:67."""

    null_encoding: str = "mask"  # "mask" | "encode"


def grouping_by_keys(keys: List[jnp.ndarray]):
    """Core grouping primitive over normalized uint keys.

    Returns (group_ids, rep_rows, num_groups):
      group_ids : int32[n], dense id per row, ids ordered by first appearance
      rep_rows  : int32[num_groups], row index of each group's first
                  occurrence, in first-appearance order
      num_groups: python int (host-synced)

    This is the TPU replacement for GrouperImpl's encode+unordered_map
    (reference: hash_aggregate.cc:313-404) in eager contexts; the Pallas
    hash-table variant (kernels/hashtable.py) replaces it in fused
    pipelines where a sort is too expensive.
    """
    n = keys[0].shape[0]
    order = sort_indices_device(keys)
    first = jnp.ones(n, dtype=jnp.bool_)
    if n > 1:
        same = jnp.ones(n - 1, dtype=jnp.bool_)
        for k in keys:
            ks = k[order]
            same = same & (ks[1:] == ks[:-1])
        first = first.at[1:].set(~same)
    # dense group ids in *sorted* order
    gid_sorted = jnp.cumsum(first) - 1
    # scatter back to row order
    group_sorted_ids = jnp.empty(n, dtype=gid_sorted.dtype)
    group_sorted_ids = group_sorted_ids.at[order].set(gid_sorted)
    num_groups = int(gid_sorted[-1]) + 1 if n > 0 else 0
    # representative (first-occurrence) row of each sorted-order group
    (first_pos,) = jnp.nonzero(first, size=num_groups, fill_value=0)
    rep_sorted = order[first_pos]  # row of first occurrence per sorted group
    # first-appearance order: sort groups by their representative row
    appearance = jnp.argsort(rep_sorted, stable=True)
    rep_rows = rep_sorted[appearance].astype(jnp.int32)
    # remap sorted-group-id -> appearance-rank
    rank = jnp.empty(num_groups, dtype=jnp.int32)
    rank = rank.at[appearance].set(jnp.arange(num_groups, dtype=jnp.int32))
    group_ids = rank[group_sorted_ids]
    return group_ids, rep_rows, num_groups


def _unique_exec(args, options, ctx):
    (col,) = args
    if not isinstance(col, Column):
        raise Invalid("unique expects an array")
    keys = normalize_sort_key(col)
    _, rep_rows, _ = grouping_by_keys(keys)
    return take_column(col, rep_rows)


register_function("unique", "vector", 1)(_unique_exec)


def _value_counts_exec(args, options, ctx):
    """Returns a RecordBatch{values, counts} (the reference returns a
    StructArray, hash_aggregate-style; a two-column batch is the same data
    and composes better downstream)."""
    (col,) = args
    keys = normalize_sort_key(col)
    group_ids, rep_rows, num_groups = grouping_by_keys(keys)
    counts = jnp.zeros(num_groups, dtype=jnp.int64)
    counts = counts.at[group_ids].add(1)
    values = take_column(col, rep_rows)
    return RecordBatch((values, Column(counts, dt.int64)), ("values", "counts"))


register_function("value_counts", "vector", 1)(_value_counts_exec)


def _dictionary_encode_exec(args, options: DictionaryEncodeOptions, ctx):
    """Returns a dictionary-typed Column (codes on device + host value pool),
    the engine's DictionaryArray equivalent."""
    from ..column import Dictionary

    (col,) = args
    options = options or DictionaryEncodeOptions()
    keys = normalize_sort_key(col)
    group_ids, rep_rows, num_groups = grouping_by_keys(keys)
    out_type = dt.dictionary(dt.int32, col.dtype)
    if col.validity is not None and options.null_encoding == "mask":
        # nulls form a group; strip it from the dictionary and null the codes
        rep_valid = col.validity[rep_rows]
        nvalid = int(jnp.sum(rep_valid))
        (keep,) = jnp.nonzero(rep_valid, size=nvalid, fill_value=0)
        code_of_group = jnp.full(num_groups, 0, dtype=jnp.int32)
        code_of_group = code_of_group.at[keep].set(
            jnp.arange(nvalid, dtype=jnp.int32))
        codes = code_of_group[group_ids]
        values = take_column(col, rep_rows[keep])
        validity = col.validity
    else:
        values = take_column(col, rep_rows)
        codes = group_ids.astype(jnp.int32)
        validity = None
    host_values = values.to_numpy()
    return Column(codes, out_type, validity=validity,
                  dictionary=Dictionary(np.asarray(host_values)))


register_function("dictionary_encode", "vector", 1, DictionaryEncodeOptions)(
    _dictionary_encode_exec)
