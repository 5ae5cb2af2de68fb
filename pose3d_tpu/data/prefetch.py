"""Double-buffered host->device batch prefetch.

Replaces the reference's producer-thread pool + condvar queue feeding Caffe
(reference src/networksolver.cpp:12-50, 315-323, 341-350) for the
out-of-core path: one background thread assembles the NEXT batch (native
threaded gather, data/native_cache.py) and starts its device transfer while
the current batch trains.  For HBM-resident datasets this module is unused —
batch assembly happens inside the jitted step (data/batcher.py).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Iterator, Optional

import jax


class DevicePrefetcher:
    """Iterate device-resident batches produced by ``make_batch(step)``.

    make_batch: step index -> pytree of host numpy arrays.
    depth: number of in-flight batches (2 = classic double buffering).
    ``stats`` records observability counters after (or during) iteration:
    consumer stall seconds (time the training loop waited on the queue —
    the number the reference could never report about its condvar queue),
    producer gather/transfer seconds, and batch count.
    """

    def __init__(self, make_batch: Callable[[int], object], steps: int,
                 depth: int = 2, device=None):
        self._make = make_batch
        self._steps = steps
        self._device = device or jax.devices()[0]
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self.stats = {"batches": 0, "consumer_stall_s": 0.0,
                      "producer_gather_s": 0.0, "producer_put_s": 0.0}
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self) -> None:
        try:
            for step in range(self._steps):
                t0 = time.perf_counter()
                host = self._make(step)
                t1 = time.perf_counter()
                dev = jax.device_put(host, self._device)  # async transfer
                self.stats["producer_gather_s"] += t1 - t0
                self.stats["producer_put_s"] += time.perf_counter() - t1
                self._q.put(dev)
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(None)

    def __iter__(self) -> Iterator:
        while True:
            t0 = time.perf_counter()
            item = self._q.get()
            self.stats["consumer_stall_s"] += time.perf_counter() - t0
            if item is None:
                if self._err is not None:
                    raise self._err
                return
            self.stats["batches"] += 1
            yield item

    def __len__(self) -> int:
        return self._steps
