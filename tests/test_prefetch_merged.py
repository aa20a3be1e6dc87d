"""Async scan pipeline (VERDICT r1 missing #7): merged generator with
bounded concurrency, streaming per-fragment decode, ordered/unordered
delivery, device-transfer stage."""

import threading
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import arrow1_tpu as a1t
from arrow1_tpu.io.prefetch import MergedIterator


class TestMergedIterator:
    def test_ordered_preserves_sequence(self):
        def make(i):
            def gen():
                for j in range(3):
                    yield (i, j)
            return gen
        out = list(MergedIterator([make(i) for i in range(5)],
                                  readahead=2, ordered=True))
        assert out == [(i, j) for i in range(5) for j in range(3)]

    def test_unordered_complete(self):
        def make(i):
            def gen():
                time.sleep(0.01 * (5 - i))
                for j in range(2):
                    yield (i, j)
            return gen
        out = list(MergedIterator([make(i) for i in range(5)],
                                  readahead=3, ordered=False))
        assert sorted(out) == [(i, j) for i in range(5) for j in range(2)]

    def test_bounded_concurrency(self):
        live = [0]
        peak = [0]
        lock = threading.Lock()

        def make(i):
            def gen():
                with lock:
                    live[0] += 1
                    peak[0] = max(peak[0], live[0])
                time.sleep(0.02)
                yield i
                with lock:
                    live[0] -= 1
            return gen
        out = list(MergedIterator([make(i) for i in range(8)],
                                  readahead=2, ordered=True, depth=1))
        assert sorted(out) == list(range(8))
        assert peak[0] <= 3  # readahead window (+1 for handoff slack)

    def test_error_propagates(self):
        def ok():
            yield 1

        def bad():
            yield 2
            raise ValueError("decode failed")

        it = MergedIterator([ok, bad], readahead=2, ordered=True)
        with pytest.raises(ValueError, match="decode failed"):
            list(it)

    def test_transfer_stage(self):
        seen = []

        def xf(x):
            seen.append(x)
            return x * 10

        out = list(MergedIterator([lambda: iter([1, 2])], transfer=xf))
        assert out == [10, 20] and seen == [1, 2]


class TestScannerPipeline:
    @pytest.fixture
    def ds_dir(self, tmp_path):
        for i in range(6):
            t = pa.table({"x": pa.array(np.arange(10) + 10 * i),
                          "y": pa.array(np.arange(10.0))})
            pq.write_table(t, tmp_path / f"part-{i}.parquet")
        return str(tmp_path)

    def test_ordered_scan(self, ds_dir):
        from arrow1_tpu.dataset import dataset

        ds = dataset(ds_dir, format="parquet")
        sc = ds.scanner(fragment_readahead=3)
        got = [b for b in sc.scan_batches()]
        xs = np.concatenate([np.asarray(b.column("x").data) for b in got])
        assert xs.tolist() == list(range(60))

    def test_unordered_scan_complete(self, ds_dir):
        from arrow1_tpu.dataset import dataset

        ds = dataset(ds_dir, format="parquet")
        sc = ds.scanner(fragment_readahead=4, ordered=False)
        got = [b for b in sc.scan_batches()]
        xs = np.concatenate([np.asarray(b.column("x").data) for b in got])
        assert sorted(xs.tolist()) == list(range(60))

    def test_to_device_scan(self, ds_dir):
        from arrow1_tpu.dataset import dataset

        ds = dataset(ds_dir, format="parquet")
        sc = ds.scanner(to_device=True)
        got = list(sc.scan_batches())
        assert sum(b.num_rows for b in got) == 60
