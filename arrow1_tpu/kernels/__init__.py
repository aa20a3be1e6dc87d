"""Pallas TPU kernels — the hand-tuned hot paths.

Design stance (why these kernels and not others): the query engine's hot
ops are gather/scatter/sort shaped. XLA's TPU lowerings of sort, gather,
and segment-scatter are already tuned, so Pallas effort goes where the
compiler can't follow:

- segsum.py: grouped aggregation as one-hot matmul on the MXU with VMEM
  accumulators — for bounded group counts this turns the reference's
  scatter hot loop (hash_aggregate.cc:522-590) into dense systolic-array
  work with zero HBM round-trips for the accumulator.
- compaction.py: single-pass tiled mask compaction with a cross-tile
  carry (TPU grid steps are sequential, so a scratch running-offset is
  legal), fusing predicate + prefix-sum + write.

Every kernel has an XLA fallback (ops/*.py) used on non-TPU backends and
as the parity oracle; dispatch is via ExecContext (config.py).
"""
