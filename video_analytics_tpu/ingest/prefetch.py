"""Double-buffered host→HBM prefetch (SURVEY.md §2b #12).

The host's only job is demux + decode (BASELINE.json north star); this
module keeps the TPU fed: decode workers run in Python threads (OpenCV
releases the GIL inside its C++ decode loop, so threads genuinely
overlap; a native C++ worker pool would add nothing on top of the
released-GIL C++ already doing the work), and ``DevicePrefetcher``
pushes batches to device asynchronously so ``jax.device_put`` of batch
k+1 overlaps compute of batch k — classic double buffering, with
queue-depth as the buffer count.

Per-stage timestamps are recorded for the observability story
(SURVEY.md §5): queue wait vs decode vs transfer time.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Callable, Iterable, Iterator, List, Optional

import jax
import numpy as np

from video_analytics_tpu.utils.logging import get_logger

log = get_logger("tpuva.ingest")

_SENTINEL = object()


def decode_worker(paths: Iterable[str], out_q: "queue.Queue",
                  loader: Callable[[str], np.ndarray],
                  error_log: Optional[List] = None) -> None:
    """Decode clips → queue.  Corrupt clips are logged and skipped
    (failure containment; the consumer never sees them)."""
    for p in paths:
        try:
            t0 = time.perf_counter()
            arr = loader(p)
            out_q.put((p, arr, time.perf_counter() - t0))
        except Exception as e:
            log.warning("decode failed: %s (%s)", p, e)
            if error_log is not None:
                error_log.append((p, repr(e)))
    out_q.put(_SENTINEL)


class DevicePrefetcher:
    """Wrap a host-batch iterator; device_put happens `depth` batches
    ahead on a worker thread, so the accelerator never waits on PCIe/
    tunnel transfer.

    Usage:
        for batch in DevicePrefetcher(host_iter, depth=2): ...
    """

    def __init__(self, it: Iterable[Any], depth: int = 2,
                 device=None, sharding=None):
        # `sharding` may be a Sharding or a callable array→Sharding
        # (per-leaf placement, e.g. rank-dependent mesh shardings).
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._sharding = sharding
        self._device = device
        self._thread = threading.Thread(
            target=self._run, args=(iter(it),), daemon=True)
        self._exc: Optional[BaseException] = None
        self.stats = {"put_s": 0.0, "batches": 0}
        self._thread.start()

    def _place(self, x):
        if not isinstance(x, (np.ndarray, jax.Array)):
            return x        # metadata leaves (ints, None, …) ride along
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # Already a global (multi-host) array — assembled upstream
            # via make_array_from_process_local_data; re-device_put
            # from one process would be both redundant and illegal.
            return x
        if callable(self._sharding):
            return jax.device_put(x, self._sharding(x))
        if self._sharding is not None:
            return jax.device_put(x, self._sharding)
        if self._device is not None:
            return jax.device_put(x, self._device)
        return jax.device_put(x)

    def _run(self, it: Iterator[Any]):
        try:
            for item in it:
                t0 = time.perf_counter()
                placed = jax.tree.map(self._place, item)
                self.stats["put_s"] += time.perf_counter() - t0
                self.stats["batches"] += 1
                self._q.put(placed)
        except BaseException as e:  # surfaced on the consumer side
            self._exc = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is _SENTINEL:
                if self._exc is not None:
                    raise self._exc
                return
            yield item


def prefetch_clips(paths: Iterable[str],
                   loader: Callable[[str], np.ndarray],
                   num_workers: int = 2,
                   queue_depth: int = 4,
                   error_log: Optional[List] = None) -> Iterator[Any]:
    """Threaded decode of many clips → (path, frames, decode_s) stream.
    Order across workers is not guaranteed (it's a throughput path).
    Decode failures are appended to `error_log` as (path, repr(exc))
    so callers can report exactly which clips failed (SURVEY.md §5
    failure detection)."""
    paths = list(paths)
    out_q: "queue.Queue" = queue.Queue(maxsize=queue_depth)
    shards = [paths[i::num_workers] for i in range(num_workers)]
    threads = []
    for shard in shards:
        t = threading.Thread(target=decode_worker,
                             args=(shard, out_q, loader, error_log),
                             daemon=True)
        t.start()
        threads.append(t)
    done = 0
    while done < num_workers:
        item = out_q.get()
        if item is _SENTINEL:
            done += 1
            continue
        yield item
