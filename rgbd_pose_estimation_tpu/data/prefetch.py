"""Host-side prefetching data pipeline (SURVEY.md L4 "prefetch pipeline").

A single background thread decodes frame i+1 (PNG decode + float conversion
is host work) while the device tracks frame i, with a bounded queue so the
producer can never run ahead unboundedly — the single-producer/single-
consumer shape that keeps host-side concurrency race-free by construction
(SURVEY.md §5.2).
"""

from __future__ import annotations

import queue
import threading


class PrefetchIterator:
    """Wrap ``loader(i) -> item`` for i in [0, n) with 1-deep lookahead."""

    def __init__(self, loader, n: int, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._n = n
        self._error = None

        def worker():
            try:
                for i in range(n):
                    self._q.put(loader(i))
            except BaseException as e:  # surfaced on the consumer side
                self._error = e
                self._q.put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        for _ in range(self._n):
            item = self._q.get()
            if item is None and self._error is not None:
                raise self._error
            yield item
