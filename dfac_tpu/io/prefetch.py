"""Background-thread batch prefetch for the ingest pipelines.

The disk -> scores serving loop alternates host work (memmap row pull +
bf16 cast) with device work (async dispatch of the folded chain). Run
serially, the host stage adds its full latency to every batch; with a
one-thread pipeline the host assembles batch k+1 while the device scores
batch k — the reference gets this from torch DataLoader's worker
processes (/root/reference/src/predict.py:60-75, num_workers); here a
single thread suffices because the heavy stages (native cast, numpy row
copies) release the GIL.

Used by ``train.evaluate.collect_masked_scores`` (prepare stage) and the
fast-serving CLIs.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class _Raised:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetched(it: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Yield from ``it`` with up to ``depth`` items materialized ahead by
    a background thread. ``depth <= 0`` degrades to plain iteration.
    Exceptions raised by the producer re-raise at the consumer; closing
    the consumer early unblocks and stops the producer.
    """
    if depth <= 0:
        yield from it
        return
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        try:
            for item in it:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            item = _SENTINEL
        except BaseException as e:  # noqa: BLE001 - re-raised at consumer
            item = _Raised(e)
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    t = threading.Thread(target=worker, daemon=True, name="dfac-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, _Raised):
                raise item.exc
            yield item
    finally:
        stop.set()
