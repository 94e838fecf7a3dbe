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
        self._exc_box: list = []
        self._done = False
        self._stopped = threading.Event()

        # the worker closes over the queue/event/exc-box DIRECTLY, not
        # over self: a running thread is a GC root (threading._active),
        # so a self-capturing closure would keep the iterator reachable
        # forever and the __del__ backstop below could never fire for
        # an abandoned (unclosed) iterator — the exact case it exists
        # for. With only the small internals captured, dropping the
        # last reference to the iterator lets __del__ stop the worker.
        q, stopped, exc_box = self._queue, self._stopped, self._exc_box

        def worker():
            try:
                for raw in host_iter:
                    item = device_fn(raw)
                    # bounded put that gives up when close() was called
                    while not stopped.is_set():
                        try:
                            q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stopped.is_set():
                        return
            except BaseException as e:  # surfaced on next()
                exc_box.append(e)
            finally:
                while not stopped.is_set():
                    try:
                        q.put(_STOP, timeout=0.2)
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
            if self._exc_box:
                raise self._exc_box.pop()
            raise StopIteration
        return item

    def _drain(self) -> None:
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass

    def close(self) -> None:
        """Stop the worker and release queued batches. Idempotent.

        Waits for the worker to actually exit (bounded): returning while
        it still runs would let the NEXT epoch's worker race it on the
        shared sampler RandomState (non-thread-safe mt19937 — corrupts
        the seeded-determinism contract) and dispatch one more stale
        device batch. A worker stuck mid-gather on a slow host finishes
        within the extended window; one stuck in a HUNG device call
        cannot be cancelled from Python — warn and return so close()
        (and the watchdog's exit path) is never itself wedged."""
        self._stopped.set()
        self._done = True
        # drain so a worker blocked in put() can observe the stop flag
        self._drain()
        deadline = 30.0
        waited = 0.0
        while self._thread.is_alive() and waited < deadline:
            self._thread.join(timeout=2.0)
            waited += 2.0
            self._drain()  # keep unblocking a put() racing the stop flag
        if self._thread.is_alive():
            import warnings
            warnings.warn(
                "PrefetchIterator.close(): worker still running after "
                f"{deadline:.0f}s (hung device call?) — continuing "
                "without it; sampler RNG determinism is not guaranteed "
                "for the next epoch")
        # a put() that was blocked can have completed AFTER the last
        # drain raised Empty — drain again post-join so no device batch
        # stays pinned in the queue after close() returns
        self._drain()

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
