"""Host-side batch prefetching.

The reference assembles each feed_dict synchronously between
sess.run calls (reference: code/pred_models.py:1719-1732), stalling
the accelerator on host work.  Here batch assembly runs on a
background thread a fixed number of batches ahead, so the TPU step
N+1's inputs are packed while step N executes.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator


class PrefetchIterator:
    """Wrap a batch iterator with a bounded background producer."""

    _END = object()

    def __init__(self, iterator: Iterator, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._err = None

        def produce():
            try:
                for item in iterator:
                    self._q.put(item)
            except BaseException as e:  # propagate to the consumer
                self._err = e
            finally:
                self._q.put(self._END)

        self._thread = threading.Thread(target=produce, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(iterator: Iterator, depth: int = 2) -> PrefetchIterator:
    return PrefetchIterator(iterator, depth=depth)
