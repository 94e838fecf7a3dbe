"""Prefetching input pipeline: overlap host sampling/augmentation
dispatch with device compute.

The reference relies on torch DataLoader workers (re-created every
epoch, train_cardiac_aesr.py:174). Here a single background thread keeps
a small queue of device-ready batches ahead of the training loop, so the
TPU never waits on the host sampler.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

_STOP = object()


class PrefetchIterator:
    """Wrap a host batch iterator; apply ``device_fn`` (host→device +
    augmentation dispatch) in a background thread, ``depth`` batches
    ahead."""

    def __init__(self, host_iter: Iterator, device_fn: Callable,
                 depth: int = 2):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._exc: Optional[BaseException] = None

        def worker():
            try:
                for raw in host_iter:
                    self._queue.put(device_fn(raw))
            except BaseException as e:  # surfaced on next()
                self._exc = e
            finally:
                self._queue.put(_STOP)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is _STOP:
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item


def prefetch_epoch(sampler, batch_size: int, device_fn: Callable,
                   depth: int = 2) -> PrefetchIterator:
    """Prefetched epoch over a TripletSampler-like object."""
    return PrefetchIterator(sampler.epoch_batches(batch_size), device_fn,
                            depth=depth)
