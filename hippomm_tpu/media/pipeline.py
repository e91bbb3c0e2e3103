"""Host↔device pipelining for ingest (SURVEY.md §7 hard part 5: decode must
never starve the TPU).

`prefetched_batches` wraps a batch-producing function with a lookahead thread:
while the device scores/encodes batch i, the host decodes batch i+1 (the C++
shim releases the GIL inside libjpeg/fread, so decode genuinely overlaps).
Bounded queue → bounded host memory.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")
_SENTINEL = object()


def prefetched(iterable: Iterable[T], lookahead: int = 2) -> Iterator[T]:
    """Iterate `iterable` with a background thread keeping `lookahead` items
    ready. Exceptions propagate to the consumer."""
    q: "queue.Queue" = queue.Queue(maxsize=lookahead)
    err: list = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate, including KeyboardInterrupt
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item


def prefetched_batches(
    make_batch: Callable[[int], T], num_batches: int, lookahead: int = 2
) -> Iterator[T]:
    """Prefetch make_batch(0..num_batches-1) with a decode-ahead thread."""
    return prefetched((make_batch(i) for i in range(num_batches)), lookahead)
