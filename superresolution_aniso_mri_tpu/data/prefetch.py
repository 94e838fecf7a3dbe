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
    ahead.

    Terminal-state safe: iterating past exhaustion keeps raising
    StopIteration (not deadlocking on an empty queue), and ``close()``
    unblocks + stops the worker so an abandoned mid-epoch iterator
    (KeyboardInterrupt, a failed train step) does not leak a thread
    pinning ``depth`` device batches of HBM. The training loop calls
    close() in its finally block; it is also safe to call repeatedly.
    """

    def __init__(self, host_iter: Iterator, device_fn: Callable,
                 depth: int = 2):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._exc: Optional[BaseException] = None
        self._done = False
        self._stopped = threading.Event()

        def worker():
            try:
                for raw in host_iter:
                    item = device_fn(raw)
                    # bounded put that gives up when close() was called
                    while not self._stopped.is_set():
                        try:
                            self._queue.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if self._stopped.is_set():
                        return
            except BaseException as e:  # surfaced on next()
                self._exc = e
            finally:
                while not self._stopped.is_set():
                    try:
                        self._queue.put(_STOP, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:
            raise StopIteration
        item = self._queue.get()
        if item is _STOP:
            self._done = True
            if self._exc is not None:
                exc, self._exc = self._exc, None
                raise exc
            raise StopIteration
        return item

    def close(self) -> None:
        """Stop the worker and release queued batches. Idempotent."""
        self._stopped.set()
        self._done = True
        # drain so a worker blocked in put() can observe the stop flag
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)

    def __del__(self):  # best-effort GC path
        try:
            self.close()
        except Exception:
            pass


def prefetch_epoch(sampler, batch_size: int, device_fn: Callable,
                   depth: int = 2) -> PrefetchIterator:
    """Prefetched epoch over a TripletSampler-like object."""
    return PrefetchIterator(sampler.epoch_batches(batch_size), device_fn,
                            depth=depth)
