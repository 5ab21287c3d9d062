"""Background prefetching over a Loader.

Replaces the reference's DataLoader worker processes (reference:
data/base.py:79-110, ``num_workers``) with a single producer thread: batch
assembly is a numpy index gather (microseconds) so one thread keeps any
device fed; batches are optionally pushed to device ahead of time
(``jax.device_put``) so the host→device copy overlaps the previous step's
compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

from vision_spectra_tpu.data.base import Batch, Loader

__all__ = ["PrefetchLoader"]

_SENTINEL = object()


class PrefetchLoader:
    """Wraps a Loader with a producer thread and bounded queue."""

    def __init__(
        self,
        loader: Loader,
        prefetch: int = 2,
        to_device: bool = True,
        sharding=None,
    ) -> None:
        self.loader = loader
        self.prefetch = max(1, prefetch)
        self.to_device = to_device
        # Optional jax.sharding.Sharding: place prefetched batches directly
        # onto the mesh (leading dim over the data axis) so the consuming
        # jitted step gets committed, correctly-sharded inputs.
        self.sharding = sharding

    def __len__(self) -> int:
        return len(self.loader)

    @property
    def num_samples(self) -> int:
        return self.loader.num_samples

    def __iter__(self) -> Iterator[Batch]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce() -> None:
            try:
                import jax

                for batch in self.loader:
                    if self.to_device:
                        batch = Batch(
                            images=jax.device_put(batch.images, self.sharding),
                            labels=jax.device_put(batch.labels, self.sharding),
                            mask=batch.mask,
                        )
                    # Bounded put with a stop check so an abandoned iterator
                    # (e.g. ``next(iter(loader))``) releases the thread
                    # instead of leaking it blocked on a full queue.
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            finally:
                while not stop.is_set():
                    try:
                        q.put(_SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                yield item
            thread.join()
        finally:
            stop.set()
