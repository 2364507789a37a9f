"""Minibatch prefetch pipeline: overlap host sampling with device compute.

A background thread runs the (numpy) sampler while the device executes the
previous step — the host↔device overlap the reference lacks entirely (its
preprocessing blocks on `.cuda()` transfers, wrapper.py:142-145).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


def prefetch(iterator: Iterable, size: int = 2,
             device_put: bool = True) -> Iterator:
    """Wrap an iterator with a ``size``-deep background prefetch queue."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _sentinel = object()
    err: list = []

    def producer():
        try:
            for item in iterator:
                if device_put:
                    item = jax.device_put(item)
                q.put(item)
        except BaseException as e:  # surface in consumer
            err.append(e)
        finally:
            q.put(_sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    while True:
        item = q.get()
        if item is _sentinel:
            if err:
                raise err[0]
            return
        yield item
