"""Threading runtime (arrow1_tpu/thread_pool.py).

Reference semantics: util/thread_pool.h:249 (dynamic capacity, global CPU
pool), util/future.h (callbacks run exactly once, then-chaining),
util/task_group.h:42 (first-error propagation, ok() early stop, serial
variant runs inline).
"""

import threading
import time

import pytest

from arrow1_tpu.errors import Invalid
from arrow1_tpu.thread_pool import (Future, TaskGroup, ThreadPool,
                                    cpu_thread_pool, parallel_map)


class TestFuture:
    def test_result_and_callback(self):
        f = Future()
        seen = []
        f.add_callback(lambda fut: seen.append(fut.result()))
        f.mark_finished(42)
        assert f.result() == 42
        assert seen == [42]
        # callback added after completion fires immediately
        f.add_callback(lambda fut: seen.append("late"))
        assert seen == [42, "late"]

    def test_error_propagates(self):
        f = Future()
        f.mark_error(ValueError("boom"))
        with pytest.raises(ValueError):
            f.result()
        assert isinstance(f.exception(), ValueError)

    def test_double_finish_raises(self):
        f = Future()
        f.mark_finished(1)
        with pytest.raises(Invalid):
            f.mark_finished(2)

    def test_then_chain(self):
        f = Future()
        g = f.then(lambda v: v * 2).then(lambda v: v + 1)
        f.mark_finished(10)
        assert g.result(timeout=5) == 21

    def test_then_error_handler(self):
        f = Future()
        g = f.then(lambda v: v, on_error=lambda e: "recovered")
        f.mark_error(RuntimeError("x"))
        assert g.result(timeout=5) == "recovered"


class TestThreadPool:
    def test_submit_and_results(self):
        with ThreadPool(4) as pool:
            futs = [pool.submit(lambda x: x * x, i) for i in range(20)]
            assert [f.result(timeout=10) for f in futs] == [
                i * i for i in range(20)]

    def test_actually_parallel(self):
        """4 sleeps of 0.15s on 4 threads must beat 0.6s serial time."""
        with ThreadPool(4) as pool:
            t0 = time.perf_counter()
            futs = [pool.submit(time.sleep, 0.15) for _ in range(4)]
            for f in futs:
                f.result(timeout=10)
            assert time.perf_counter() - t0 < 0.45

    def test_error_in_task(self):
        with ThreadPool(2) as pool:
            f = pool.submit(lambda: 1 / 0)
            with pytest.raises(ZeroDivisionError):
                f.result(timeout=10)

    def test_set_capacity_up_and_down(self):
        pool = ThreadPool(1)
        try:
            assert pool.capacity == 1
            pool.set_capacity(4)
            assert pool.capacity == 4
            # 4 concurrent sleeps now overlap
            t0 = time.perf_counter()
            futs = [pool.submit(time.sleep, 0.1) for _ in range(4)]
            for f in futs:
                f.result(timeout=10)
            assert time.perf_counter() - t0 < 0.35
            pool.set_capacity(1)
            assert pool.capacity == 1
            with pytest.raises(Invalid):
                pool.set_capacity(0)
        finally:
            pool.shutdown()

    def test_submit_after_shutdown_raises(self):
        pool = ThreadPool(2)
        pool.submit(lambda: None).result(timeout=10)
        pool.shutdown()
        with pytest.raises(Invalid):
            pool.submit(lambda: None)

    def test_shutdown_waits_for_queue(self):
        pool = ThreadPool(2)
        done = []
        for i in range(8):
            pool.submit(lambda i=i: (time.sleep(0.02), done.append(i)))
        pool.shutdown(wait=True)
        assert len(done) == 8

    def test_global_pool(self):
        pool = cpu_thread_pool()
        assert pool is cpu_thread_pool()
        assert pool.submit(lambda: "ok").result(timeout=10) == "ok"


class TestTaskGroup:
    def test_threaded_finish(self):
        hits = []
        lock = threading.Lock()
        with TaskGroup() as tg:
            for i in range(16):
                def task(i=i):
                    with lock:
                        hits.append(i)
                tg.append(task)
        assert sorted(hits) == list(range(16))

    def test_first_error_propagates(self):
        tg = TaskGroup()
        tg.append(lambda: time.sleep(0.01))
        tg.append(lambda: (_ for _ in ()).throw(RuntimeError("first")))
        with pytest.raises(RuntimeError):
            tg.finish()
        assert not tg.ok()
        # appends after error are dropped, not run
        ran = []
        tg2 = TaskGroup(threaded=False)
        tg2.append(lambda: (_ for _ in ()).throw(ValueError("e")))
        tg2.append(lambda: ran.append(1))
        with pytest.raises(ValueError):
            tg2.finish()
        assert ran == []

    def test_serial_runs_inline(self):
        order = []
        tg = TaskGroup(threaded=False)
        tg.append(lambda: order.append(1))
        tg.append(lambda: order.append(2))
        tg.finish()
        assert order == [1, 2]

    def test_finish_async(self):
        tg = TaskGroup()
        tg.append(time.sleep, 0.05)
        fut = tg.finish_async()
        assert fut.result(timeout=10) is None

    def test_append_after_finish_raises(self):
        tg = TaskGroup(threaded=False)
        tg.finish()
        with pytest.raises(Invalid):
            tg.append(lambda: None)


def test_parallel_map_ordered():
    out = parallel_map(lambda x: x * 3, range(50))
    assert out == [x * 3 for x in range(50)]


def test_write_dataset_uses_taskgroup(tmp_path):
    """End-to-end: the partitioned dataset write goes through TaskGroup."""
    import arrow1_tpu as a1t
    from arrow1_tpu.dataset import dataset, write_dataset

    rb = a1t.record_batch({"k": ["a", "b", "a", "c", "b", "a"],
                           "v": [1, 2, 3, 4, 5, 6]})
    write_dataset(rb, str(tmp_path / "ds"), partitioning_keys=["k"],
                  format="ipc")
    ds = dataset(str(tmp_path / "ds"), format="ipc", partitioning="hive")
    got = ds.to_table().sort_by("v")
    assert got.column("v").to_numpy().tolist() == [1, 2, 3, 4, 5, 6]
