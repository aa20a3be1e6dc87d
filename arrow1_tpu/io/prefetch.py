"""Readahead pipelining: overlap host decode + H2D transfer with compute.

Reference: the pull-based AsyncGenerator combinators — readahead
(util/async_generator.h:898), background generator, transferred generator —
that let the reference's scanners overlap IO with CPU work
(dataset/scanner.cc:426-650). The TPU analogue is simpler: a bounded-queue
background thread produces device-resident batches while the main thread's
device computations run; JAX dispatch is async, so consume/produce overlap
naturally once batches are on device.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

from ..table import RecordBatch

__all__ = ["ReadaheadIterator", "prefetch_batches"]

_SENTINEL = object()


class ReadaheadIterator:
    """Wrap a batch iterator with an N-deep background prefetch queue
    (reference: MakeReadaheadGenerator async_generator.h:898)."""

    def __init__(self, source: Iterator[RecordBatch], readahead: int = 2,
                 transfer: Optional[Callable] = None):
        self._source = source
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(readahead, 1))
        self._transfer = transfer
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._source:
                if self._transfer is not None:
                    item = self._transfer(item)
                self._queue.put(item)
        except BaseException as e:  # propagate to consumer
            self._error = e
        finally:
            self._queue.put(_SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is _SENTINEL:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def prefetch_batches(source, readahead: int = 2, device=None):
    """Readahead + optional explicit device placement of each batch."""
    transfer = None
    if device is not None:
        import jax

        def transfer(batch):
            return jax.device_put(batch, device)

    return ReadaheadIterator(iter(source), readahead, transfer)
