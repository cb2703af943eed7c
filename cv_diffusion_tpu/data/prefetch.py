"""Host-side prefetch: overlap next-batch assembly with the device step.

The reference overlaps input loading with compute via DataLoader worker
subprocesses (``src/training/dataset.py:371-378``); here a single background
thread drains the underlying loader (whose heavy work — decode + augment —
runs GIL-free in the native C++ pipeline) into a small bounded queue while
the TPU executes the current step.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np

_SENTINEL = object()


class PrefetchLoader:
    """Wraps any epoch-iterable loader with a depth-``prefetch`` queue.

    Re-iterable: each ``__iter__`` starts a fresh producer thread over one
    epoch of the underlying loader. Exceptions in the producer propagate to
    the consumer.
    """

    def __init__(self, loader, prefetch: int = 2):
        assert prefetch >= 1
        self.loader = loader
        self.prefetch = prefetch

    def __len__(self) -> int:
        return len(self.loader)

    @property
    def dataset(self):
        return getattr(self.loader, "dataset", None)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        err = []
        stop = threading.Event()

        def produce():
            try:
                for batch in self.loader:
                    if stop.is_set():
                        return
                    q.put(batch)
                    if stop.is_set():
                        return
            except BaseException as e:  # propagate to consumer
                err.append(e)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                yield item
        finally:
            # Consumer stopped early (break / next(iter(...))): signal the
            # producer so it assembles at most one more batch instead of
            # decoding the rest of the epoch into the void, then drain.
            stop.set()
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    t.join(timeout=0.1)
        if err:
            raise err[0]
