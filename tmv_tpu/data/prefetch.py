"""Generic producer-thread prefetch for batch iterators.

The detector pipelines have bespoke prefetch-to-device producers
(`yolo_pipeline.__iter__`, `efficientdet_pipeline._prefetched`); this is
the same pattern as a reusable wrapper for the simpler feeds (UNet,
MoCo two-crop, distill pseudo-label batches): the wrapped iterator runs
on a daemon thread with a bounded queue, so host staging and any device
dispatch it performs overlap the consumer's train step.  Exceptions
(including StopIteration for finite iterators) surface in the consumer.
"""

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_DONE = object()


def prefetched(iterable: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Iterate ``iterable`` on a producer thread, ``depth`` items ahead.

    ``depth <= 0`` returns the iterable's own iterator (synchronous).
    """
    if depth <= 0:
        return iter(iterable)

    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def produce():
        try:
            for item in iterable:
                q.put(item)
            q.put(_DONE)
        except BaseException as e:  # surface in the consumer
            q.put(e)

    threading.Thread(target=produce, daemon=True).start()

    def consume():
        while True:
            item = q.get()
            if item is _DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    return consume()
