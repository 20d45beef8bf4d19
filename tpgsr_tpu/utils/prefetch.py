"""Background-thread prefetch iterator shared by the train and eval loops.

One copy of the subtle shutdown protocol (trainer._device_prefetch and
train/evaluate.py previously each carried their own): the producer thread
applies ``transform`` ``depth`` items ahead of the consumer, gives up
promptly when the consumer abandons the generator (early break / exception
— a plain ``q.put`` would block forever holding a loader iteration), closes
the source iterator to release worker pools, and forwards exceptions to the
consumer thread.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional


def prefetch_iter(
    src_iter: Iterator,
    transform: Optional[Callable] = None,
    depth: int = 2,
) -> Iterator:
    """Yield ``transform(item)`` for each item of ``src_iter``, with the
    transform running in a background thread up to ``depth`` items ahead.

    ``transform`` runs in the single producer thread, so it may keep
    sequential state in a closure.  Exceptions from the source or the
    transform re-raise in the consumer.  When the consumer exits early the
    producer stops at its next ``put`` and the source iterator's ``close``
    (if any) runs either way.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in src_iter:
                out = transform(item) if transform is not None else item
                if not put(out):
                    return
            put(_END)
        except BaseException as e:  # surfaced in the consumer thread
            put(e)
        finally:
            close = getattr(src_iter, "close", None)
            if close is not None:
                close()  # release loader worker pools promptly

    threading.Thread(target=producer, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()  # unblock the producer if we exit early
