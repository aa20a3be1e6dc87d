"""Dense tensors + sparse formats (COO/CSR/CSF-lite).

Reference: cpp/src/arrow/tensor*.{h,cc} + arrow/tensor/ — dense Tensor
with strides, SparseCOOTensor/SparseCSRMatrix/SparseCSFTensor and
conversions. TPU redesign: a dense Tensor is just a device array + dim
names (strides are XLA's concern); sparse formats keep the reference's
index layouts as device arrays so they convert zero-copy to/from
pyarrow's sparse tensors at the host boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .errors import Invalid

__all__ = ["Tensor", "SparseCOOTensor", "SparseCSRMatrix"]


@jax.tree_util.register_pytree_node_class
class Tensor:
    """Dense n-dim tensor (reference: arrow/tensor.h Tensor)."""

    __slots__ = ("data", "dim_names")

    def __init__(self, data, dim_names: Optional[Sequence[str]] = None):
        self.data = data
        self.dim_names = tuple(dim_names) if dim_names else None

    def tree_flatten(self):
        return (self.data,), (self.dim_names,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @property
    def shape(self):
        return tuple(self.data.shape)

    @property
    def ndim(self):
        return self.data.ndim

    @property
    def size(self):
        return int(np.prod(self.data.shape))

    def to_numpy(self):
        return np.asarray(self.data)

    def to_arrow(self):
        import pyarrow as pa

        return pa.Tensor.from_numpy(self.to_numpy(),
                                    dim_names=self.dim_names)

    @classmethod
    def from_arrow(cls, t) -> "Tensor":
        names = list(t.dim_names) if t.dim_names else None
        return cls(jnp.asarray(t.to_numpy()), names)

    def to_coo(self) -> "SparseCOOTensor":
        """Dense -> COO (host-syncs nnz, like the eager two-phase ops)."""
        nz = self.data != 0
        nnz = int(jnp.sum(nz))
        flat_idx = jnp.nonzero(nz.ravel(), size=nnz, fill_value=0)[0]
        coords = jnp.stack(jnp.unravel_index(flat_idx, self.data.shape),
                           axis=1).astype(jnp.int64)
        values = self.data.ravel()[flat_idx]
        return SparseCOOTensor(coords, values, self.shape, self.dim_names)

    def __repr__(self):
        return f"Tensor{self.shape} {self.data.dtype}"


@jax.tree_util.register_pytree_node_class
class SparseCOOTensor:
    """COO: [nnz, ndim] coordinates + values (reference:
    arrow/sparse_tensor.h SparseCOOIndex)."""

    __slots__ = ("coords", "values", "shape", "dim_names")

    def __init__(self, coords, values, shape, dim_names=None):
        self.coords = coords
        self.values = values
        self.shape = tuple(shape)
        self.dim_names = tuple(dim_names) if dim_names else None

    def tree_flatten(self):
        return (self.coords, self.values), (self.shape, self.dim_names)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])

    @property
    def non_zero_length(self):
        return int(self.values.shape[0])

    def to_dense(self) -> Tensor:
        out = jnp.zeros(self.shape, self.values.dtype)
        out = out.at[tuple(self.coords[:, i] for i in range(len(self.shape)))
                     ].set(self.values)
        return Tensor(out, self.dim_names)

    def to_csr(self) -> "SparseCSRMatrix":
        if len(self.shape) != 2:
            raise Invalid("CSR requires a 2-D tensor")
        rows = self.coords[:, 0]
        cols = self.coords[:, 1]
        order = jnp.argsort(rows * self.shape[1] + cols, stable=True)
        rows, cols = rows[order], cols[order]
        values = self.values[order]
        indptr = jnp.searchsorted(
            rows, jnp.arange(self.shape[0] + 1, dtype=rows.dtype))
        return SparseCSRMatrix(indptr, cols, values, self.shape,
                               self.dim_names)

    def to_arrow(self):
        import pyarrow as pa

        return pa.SparseCOOTensor.from_numpy(
            np.asarray(self.values), np.asarray(self.coords),
            self.shape, dim_names=self.dim_names)

    @classmethod
    def from_arrow(cls, t) -> "SparseCOOTensor":
        values, coords = t.to_numpy()
        return cls(jnp.asarray(coords), jnp.asarray(values.ravel()),
                   t.shape, list(t.dim_names) if t.dim_names else None)


@jax.tree_util.register_pytree_node_class
class SparseCSRMatrix:
    """CSR: indptr[rows+1] + col indices + values (reference:
    arrow/sparse_tensor.h SparseCSRIndex)."""

    __slots__ = ("indptr", "indices", "values", "shape", "dim_names")

    def __init__(self, indptr, indices, values, shape, dim_names=None):
        self.indptr = indptr
        self.indices = indices
        self.values = values
        self.shape = tuple(shape)
        self.dim_names = tuple(dim_names) if dim_names else None

    def tree_flatten(self):
        return (self.indptr, self.indices, self.values), (self.shape,
                                                          self.dim_names)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1])

    @property
    def non_zero_length(self):
        return int(self.values.shape[0])

    def to_dense(self) -> Tensor:
        nnz = self.values.shape[0]
        lengths = self.indptr[1:] - self.indptr[:-1]
        rows = jnp.repeat(jnp.arange(self.shape[0]), lengths,
                          total_repeat_length=nnz)
        out = jnp.zeros(self.shape, self.values.dtype)
        out = out.at[rows, self.indices].set(self.values)
        return Tensor(out, self.dim_names)

    def matvec(self, x) -> jnp.ndarray:
        """SpMV via segment-sum — the TPU-native sparse kernel shape."""
        nnz = self.values.shape[0]
        lengths = self.indptr[1:] - self.indptr[:-1]
        rows = jnp.repeat(jnp.arange(self.shape[0]), lengths,
                          total_repeat_length=nnz)
        prod = self.values * x[self.indices]
        return jnp.zeros(self.shape[0], prod.dtype).at[rows].add(prod)

    def to_arrow(self):
        import pyarrow as pa

        return pa.SparseCSRMatrix.from_numpy(
            np.asarray(self.values), np.asarray(self.indptr),
            np.asarray(self.indices), self.shape, dim_names=self.dim_names)
