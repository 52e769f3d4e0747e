"""Host->device input prefetching.

Overlaps the host data pipeline and the H2D transfer of batch N+1 with
the device computation of batch N — the TPU-native replacement for the
reference's double-buffered shared-memory queue feeding sess.run
(data_queue.py + training_data.py:179-189).
"""

from __future__ import annotations

import collections
import threading
from queue import Queue

import jax


def prefetch_to_device(
    iterator, size: int = 2, sharding=None, transform=None, put_fn=None
):
    """Wrap a batch iterator so device transfer runs ahead.

    Args:
      iterator: yields items; if ``transform`` is given it maps an item
        to ``(device_part, host_part)`` where only device_part is put on
        device. Otherwise the whole item is device_put.
      size: prefetch depth (2 = classic double buffering).
      sharding: optional sharding for the device_put.
      put_fn: overrides the transfer entirely (e.g.
        ``multihost.make_global_batch`` assembling per-process rows into
        one global array — jax.device_put cannot do that, the global
        array is not host-addressable).

    Yields items with the device part already transferred.
    """
    q: Queue = Queue(maxsize=size)
    done = object()
    err = []

    def put(x):
        if put_fn is not None:
            return put_fn(x)
        if sharding is not None:
            return jax.device_put(x, sharding)
        return jax.device_put(x)

    def producer():
        try:
            for item in iterator:
                if transform is not None:
                    dev, host = transform(item)
                    q.put((put(dev), host))
                else:
                    q.put(put(item))
        except BaseException as e:  # surface pipeline errors to consumer
            err.append(e)
        finally:
            q.put(done)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is done:
            if err:
                raise err[0]
            return
        yield item
