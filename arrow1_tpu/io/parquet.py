"""Parquet reader/writer.

Reference: cpp/src/parquet/ (55.8 kLoC full read/write stack) +
parquet/arrow adapter (parquet/arrow/reader.h:107). Flat columns with
the common encodings decode through the native path
(io/parquet_native.py: hand-rolled Thrift compact metadata, page +
RLE-hybrid + dictionary decode, native snappy); `filters=` runs
natively (DNF -> engine Expression -> row filter); encryption falls
back to pyarrow.parquet. Projection
(columns=) and row-group selection push down into the decoder — the
same pushdowns the reference's ArrowReaderProperties exposes — so only
needed bytes are decoded and shipped to the device.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Union

from ..interop import record_batch_from_arrow, record_batch_to_arrow
from ..table import RecordBatch, Table

__all__ = ["read_parquet", "write_parquet", "iter_parquet_batches",
           "encryption_properties", "decryption_properties", "InMemoryKms"]


class InMemoryKms:
    """Test/single-process KMS: wraps data keys by XOR with a named master
    key (reference: parquet/encryption/kms_client.h KmsClient — production
    deployments plug a real KMS here; the wrap format is KMS-private)."""

    def __init__(self, master_keys):
        self._keys = {k: bytes(v) for k, v in master_keys.items()}

    def _factory(self, kms_connection_config=None):
        import base64

        import pyarrow.parquet.encryption as pe

        keys = self._keys

        class _Client(pe.KmsClient):
            def __init__(self):
                pe.KmsClient.__init__(self)

            def wrap_key(self, key_bytes, master_key_identifier):
                mk = keys[master_key_identifier]
                x = bytes(b ^ mk[i % len(mk)]
                          for i, b in enumerate(key_bytes))
                return base64.b64encode(x).decode()

            def unwrap_key(self, wrapped_key, master_key_identifier):
                mk = keys[master_key_identifier]
                x = base64.b64decode(wrapped_key)
                return bytes(b ^ mk[i % len(mk)] for i, b in enumerate(x))

        return _Client()


def encryption_properties(footer_key: str, column_keys=None,
                          master_keys=None,
                          algorithm: str = "AES_GCM_V1"):
    """Parquet modular encryption config (reference:
    parquet/encryption/encryption.h FileEncryptionProperties +
    crypto_factory.h). ``column_keys`` maps master-key-id -> [columns];
    ``master_keys`` maps key-id -> key bytes (16/24/32 bytes).

    Returns an opaque handle accepted by ``write_parquet(encryption=...)``
    and ``read_parquet(decryption=...)``.
    """
    import pyarrow.parquet.encryption as pe

    kms = InMemoryKms(master_keys or {})
    factory = pe.CryptoFactory(kms._factory)
    cfg = pe.EncryptionConfiguration(
        footer_key=footer_key,
        column_keys=column_keys or {},
        encryption_algorithm=algorithm)
    return {"factory": factory, "config": cfg,
            "kms_config": pe.KmsConnectionConfig()}


def decryption_properties(master_keys):
    """Reader-side handle: the same master keys (reference:
    encryption.h FileDecryptionProperties)."""
    import pyarrow.parquet.encryption as pe

    kms = InMemoryKms(master_keys)
    factory = pe.CryptoFactory(kms._factory)
    return {"factory": factory, "config": pe.DecryptionConfiguration(),
            "kms_config": pe.KmsConnectionConfig()}


def _filters_to_expr(filters):
    """pyarrow-style DNF filters -> engine Expression.
    [(c,op,v),...] is a conjunction; [[...],[...]] an OR of those
    (python/pyarrow/parquet.py filters_to_expression)."""
    from ..expr import field

    def leaf(c, op, v):
        f = field(c)
        if op in ("=", "=="):
            return f == v
        if op == "!=":
            return f != v
        if op == "<":
            return f < v
        if op == ">":
            return f > v
        if op == "<=":
            return f <= v
        if op == ">=":
            return f >= v
        if op == "in":
            return f.isin(list(v))
        if op == "not in":
            return ~f.isin(list(v))
        raise ValueError(f"parquet filters: unsupported op {op!r}")

    if filters and isinstance(filters[0], tuple):
        filters = [filters]
    ors = None
    for conj in filters:
        ands = None
        for c, op, v in conj:
            e = leaf(c, op, v)
            ands = e if ands is None else (ands & e)
        ors = ands if ors is None else (ors | ands)
    return ors


def read_parquet(path, columns: Optional[Sequence[str]] = None,
                 filters=None, decryption=None) -> Table:
    if decryption is None:
        try:
            from ..errors import Invalid
            from .parquet_native import read_parquet_native

            expr = _filters_to_expr(filters) if filters else None
            # the filter may reference columns outside the projection:
            # read the union, project after the row filter
            need = None
            if columns is not None:
                need = list(columns)
                if expr is not None:
                    for r in sorted(expr.fields()):
                        if r not in need:
                            need.append(r)
            with open(path, "rb") as f:
                buf = f.read()
            rg_keep = None
            if filters:
                # bloom-filter row-group skip (parquet/bloom_filter.h)
                from .parquet_native import bloom_prune_row_groups

                rg_keep = bloom_prune_row_groups(buf, filters)
            if rg_keep == []:
                # every row group pruned: type-correct empty result
                rb = read_parquet_native(buf, columns=need,
                                         row_groups=[0]).slice(0, 0)
            else:
                rb = read_parquet_native(buf, columns=need,
                                         row_groups=rg_keep)
            if expr is not None:
                mask = expr.execute(rb)
                rb = rb.filter(mask)
            if columns is not None and (need or []) != list(columns):
                rb = rb.select(list(columns))
            return Table([rb])
        except Invalid:
            pass  # nested/unsupported -> pyarrow fallback
        except (OSError, TypeError, AttributeError):
            pass  # path-like objects / buffers -> pyarrow
    import pyarrow.parquet as pq

    dp = None
    if decryption is not None:
        dp = decryption["factory"].file_decryption_properties(
            decryption["kms_config"], decryption["config"])
    tbl = pq.read_table(path, columns=list(columns) if columns else None,
                        filters=filters, decryption_properties=dp)
    return Table([record_batch_from_arrow(tbl)])


def iter_parquet_batches(path, columns: Optional[Sequence[str]] = None,
                         batch_rows: int = 1 << 20) -> Iterator[RecordBatch]:
    """Row-group-granular streaming read (reference:
    GetRecordBatchReader parquet/arrow/reader.cc:257). Native: one
    decode per row group, re-chunked to ~batch_rows; pyarrow only for
    files the native reader declines (BROTLI/LZO/encrypted)."""
    native = None
    try:
        from ..errors import Invalid
        from .parquet_native import (parquet_row_group_count,
                                     read_parquet_native)

        with open(path, "rb") as f:
            buf = f.read()
        n_rg = parquet_row_group_count(buf)
        cols = list(columns) if columns else None
        # decode group 0 BEFORE yielding anything: an unsupported
        # feature must fall back cleanly, not mid-stream
        first = read_parquet_native(buf, columns=cols, row_groups=[0]) \
            if n_rg else None
        native = (buf, n_rg, cols, first)
    except Invalid:
        pass
    except (OSError, TypeError):
        pass
    if native is not None:
        buf, n_rg, cols, first = native
        for i in range(n_rg):
            rb = first if i == 0 else read_parquet_native(
                buf, columns=cols, row_groups=[i])
            for lo in range(0, max(rb.num_rows, 1), batch_rows):
                if lo >= rb.num_rows:
                    break
                yield rb.slice(lo, min(batch_rows, rb.num_rows - lo))
        return
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    for batch in pf.iter_batches(batch_size=batch_rows,
                                 columns=list(columns) if columns else None):
        yield record_batch_from_arrow(batch)


def write_parquet(data: Union[RecordBatch, Table], path: str,
                  compression: str = "snappy", row_group_size=None,
                  encryption=None, use_byte_stream_split: bool = False,
                  use_delta_binary_packed: bool = False,
                  bloom_filter_columns=None):
    if encryption is None and isinstance(data, (RecordBatch, Table)):
        try:
            from ..errors import Invalid
            from .parquet_native import write_parquet_native

            batch = (data.combine_chunks()
                     if isinstance(data, Table) else data)
            import io as _io

            sink = _io.BytesIO()
            write_parquet_native(
                batch, sink, compression=compression,
                row_group_size=row_group_size,
                use_byte_stream_split=use_byte_stream_split,
                use_delta_binary_packed=use_delta_binary_packed,
                bloom_filter_columns=bloom_filter_columns)
            with open(path, "wb") as f:
                f.write(sink.getvalue())
            return
        except (Invalid, KeyError):
            pass  # nested/unsupported type or codec -> pyarrow fallback
    import pyarrow as pa
    import pyarrow.parquet as pq

    if isinstance(data, Table):
        tbl = pa.Table.from_batches([record_batch_to_arrow(b)
                                     for b in data.batches])
    else:
        tbl = pa.Table.from_batches([record_batch_to_arrow(data)])
    if encryption is not None:
        fep = encryption["factory"].file_encryption_properties(
            encryption["kms_config"], encryption["config"])
        with pq.ParquetWriter(path, tbl.schema, compression=compression,
                              encryption_properties=fep) as w:
            w.write_table(tbl, row_group_size=row_group_size)
        return
    pq.write_table(tbl, path, compression=compression,
                   row_group_size=row_group_size)
