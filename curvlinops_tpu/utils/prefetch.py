"""Device-prefetching data pipeline.

The torch reference leans on ``DataLoader(num_workers=...)`` to hide host
data preparation behind GPU compute; in JAX the device side is already
asynchronous (dispatch and ``device_put`` return immediately), so the only
serial part left is the HOST side of the iterator — decoding, augmenting,
converting to arrays. :class:`PrefetchToDevice` moves that host work onto a
background thread and issues the (async) transfers ``size`` batches ahead,
so streaming curvature passes over large datasets overlap host prep, the
host-to-device copy, and TPU compute.

Deliberately NOT a data loader: batching, shuffling, and augmentation stay
user-land (any iterable of ``(X, y)`` pytrees works, exactly as for the
operators themselves). The wrapper is order-preserving and freshly
re-iterable, so the determinism safety rails (`risk.py`) — which run two
independent passes and compare them — see the same batches in the same
order and still catch a non-deterministic underlying iterable.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator

import jax

__all__ = ["PrefetchToDevice", "prefetch_to_device"]

_SENTINEL = object()


class PrefetchToDevice:
    """Wrap a batch iterable: background host pull + ahead-of-time transfer.

    Args:
        data: Iterable of batch pytrees (e.g. ``(X, y)`` tuples). Must be
            re-iterable if the consumer iterates more than once (operators
            iterate at least twice: data statistics and the compute pass).
        size: How many batches to keep in flight (host queue depth). Two is
            enough to overlap one batch of host work with device compute.
        sharding: Optional :class:`jax.sharding.Sharding` (or a pytree of
            shardings matching the batch structure) for the transfer. When
            ``None``, batches go to the default device uncommitted —
            operators with a ``mesh=`` re-place them for free since
            ``device_put`` to the same layout is a no-op.

    Example::

        data = PrefetchToDevice(my_batches, size=2)
        GGN = GGNLinearOperator(model_fn, loss_fn, params, data)
    """

    def __init__(
        self, data: Iterable[Any], size: int = 2, sharding: Any = None
    ) -> None:
        if size < 1:
            raise ValueError(f"prefetch size must be >= 1, got {size}")
        self._data = data
        self._size = size
        self._sharding = sharding

    def _put(self, batch: Any) -> Any:
        if self._sharding is None:
            return jax.tree.map(jax.device_put, batch)
        if isinstance(self._sharding, jax.sharding.Sharding):
            return jax.tree.map(
                lambda leaf: jax.device_put(leaf, self._sharding), batch
            )
        return jax.tree.map(jax.device_put, batch, self._sharding)

    def __iter__(self) -> Iterator[Any]:
        q: queue.Queue = queue.Queue(maxsize=self._size)
        stop = threading.Event()

        def enqueue(item: Any) -> bool:
            """Blocking put that gives up once the consumer is gone."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                for batch in self._data:
                    if stop.is_set():
                        return
                    # device_put on the worker thread: the host-side prep of
                    # batch i+1..i+size overlaps the consumer's compute on i
                    if not enqueue(self._put(batch)):
                        return
            except BaseException as exc:  # propagate into the consumer
                enqueue((_SENTINEL, exc))
                return
            enqueue((_SENTINEL, None))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, tuple) and len(item) == 2 and item[0] is _SENTINEL:
                    if item[1] is not None:
                        raise item[1]
                    return
                yield item
        finally:
            # stop the producer if the consumer quits early (e.g. zip()
            # with a shorter iterator) without consuming the whole dataset
            stop.set()
            while thread.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                thread.join(timeout=0.1)


def prefetch_to_device(
    data: Iterable[Any], size: int = 2, sharding: Any = None
) -> PrefetchToDevice:
    """Functional alias for :class:`PrefetchToDevice`."""
    return PrefetchToDevice(data, size=size, sharding=sharding)
