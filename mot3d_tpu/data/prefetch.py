"""Device-side input prefetch: overlap H2D transfer with compute.

The reference's input pipeline is a torch DataLoader with NUM_WORKERS=0
(`Detection/cfg_setup.py:45`) — every iteration pays dataset IO and the
host->GPU copy synchronously.  The rebuild's loaders already do file IO in
a background thread (data/detection_loader.py); this module adds the
device half of the north-star fused pipeline:

  - `device_prefetch` wraps any host-batch iterator and `jax.device_put`s
    each batch from a background thread, `buffer_size` batches ahead.
    JAX dispatch is thread-safe and device_put is asynchronous, so the
    PCIe/ICI transfer of batch N+1 overlaps the compute of batch N and
    the train step never blocks on H2D.
  - an optional `sharding` places batches straight into their pjit layout
    (e.g. NamedSharding(mesh, P("data")) for the data-parallel steps), so
    sharded training consumes pre-sharded arrays with no resharding copy.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax


def device_prefetch(batches: Iterator, buffer_size: int = 2,
                    sharding: Optional[jax.sharding.Sharding] = None
                    ) -> Iterator:
    """Yield device-resident copies of `batches`, transferred ahead of use.

    Works on any pytree of numpy/jax arrays.  With `sharding`, leaves are
    placed directly into that sharding (leading-axis batch sharding for the
    data-parallel steps); otherwise onto the default device.
    """
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    stop = object()

    def put(x):
        return jax.device_put(x, sharding) if sharding is not None \
            else jax.device_put(x)

    def worker():
        try:
            for batch in batches:
                q.put(jax.tree_util.tree_map(put, batch))
            q.put(stop)
        except BaseException as e:  # propagate loader/transfer errors
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is stop:
            return
        if isinstance(item, BaseException):
            # Re-raise in the consumer: a data error must abort training,
            # not masquerade as iterator exhaustion.
            raise item
        yield item
