"""Host-side prefetching data pipeline (SURVEY.md L4 "prefetch pipeline").

A single background thread decodes frame i+1 (PNG decode + float conversion
is host work) while the device tracks frame i, with a bounded queue so the
producer can never run ahead unboundedly — the single-producer/single-
consumer shape that keeps host-side concurrency race-free by construction
(SURVEY.md §5.2).
"""

from __future__ import annotations

import queue
import threading


class PrefetchIterator:
    """Wrap ``loader(i) -> item`` for i in [0, n) with 1-deep lookahead."""

    def __init__(self, loader, n: int, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._n = n
        self._error = None

        def worker():
            try:
                for i in range(n):
                    self._q.put(loader(i))
            except BaseException as e:  # surfaced on the consumer side
                self._error = e
                self._q.put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        for _ in range(self._n):
            item = self._q.get()
            if item is None and self._error is not None:
                raise self._error
            yield item


def background_iter(gen, depth: int = 2):
    """Drain ``gen`` in a daemon thread through a bounded queue.

    Single-producer/single-consumer (SURVEY.md §5.2); used to overlap
    host→device transfers with the consumer's compute.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    done = object()
    err = []

    def worker():
        try:
            for item in gen:
                q.put(item)
        except BaseException as e:
            err.append(e)
        q.put(done)

    threading.Thread(target=worker, daemon=True).start()

    def out():
        while True:
            item = q.get()
            if item is done:
                if err:
                    raise err[0]
                return
            yield item

    return out()


def sequence_prefetcher(
    seq, start: int, n: int, n_threads: int = 4, device_depth: bool = False
):
    """Best prefetching iterator for ``seq``: yields ``(ts, gray, depth)``.

    PNG-backed sequences (TUM / ICL TUM-compatible) stream through the
    native C++ decode pool (`native_loader.NativePrefetcher`) — parallel
    inflate off the GIL — with float conversion done here on the consumer
    side. Anything else (raw ICL text depth, missing native lib, odd PNG
    formats) falls back to the Python single-thread `PrefetchIterator`
    over ``seq.frame``; both paths yield identical values.

    ``device_depth=True`` additionally ships the depth to the accelerator
    from the prefetch thread, ahead of consumption, and yields it as a
    *device* array — raw uint16 for PNG sequences (half the transfer
    bytes; scale to meters on device via ``seq.depth_scale``), float32
    meters otherwise. Consumers must handle both dtypes (DenseOdometry
    does).
    """
    import os

    import numpy as np

    from rgbd_pose_estimation_tpu.data import native_loader as nl

    def _fallback():
        base = PrefetchIterator(lambda i: seq.frame(start + i), n)
        if not device_depth:
            return base
        import jax

        return background_iter(
            (ts, gray, jax.device_put(depth)) for ts, gray, depth in base
        )

    rgb_files = getattr(seq, "rgb_files", None)
    depth_files = getattr(seq, "depth_files", None)
    root = getattr(seq, "root", None)
    scale = getattr(seq, "depth_scale", None)
    if (
        rgb_files is None
        or depth_files is None
        or scale is None
        or not nl.native_available()
        or not str(depth_files[start]).endswith(".png")
    ):
        return _fallback()

    rgb = [os.path.join(root, f) for f in rgb_files[start : start + n]]
    dep = [os.path.join(root, f) for f in depth_files[start : start + n]]
    try:
        w, h, ch, bd = nl.png_dims(dep[0])
        if (ch, bd) != (1, 16) or nl.png_dims(rgb[0])[:2] != (w, h):
            return _fallback()
        pf = nl.NativePrefetcher(rgb, dep, w, h, n_threads=n_threads)
    except Exception:
        return _fallback()

    ts = seq.timestamps

    if device_depth:
        import jax

        def _gen_dev():
            # Batch several frames into ONE host→device transfer: transfer
            # setup cost dominates at these sizes (especially on remote-
            # attached devices), and an on-device slice per frame is free.
            B = 4
            with pf:
                buf = []
                for i, gray_u8, depth_u16 in pf:
                    # Same gray semantics as the Python fallback path:
                    # float32 in [0, 1] regardless of decode backend.
                    gray = gray_u8.astype(np.float32) / 255.0
                    buf.append((float(ts[start + i]), gray, depth_u16))
                    if len(buf) == B:
                        stack = jax.device_put(np.stack([b[2] for b in buf]))
                        for k, (t, g, _) in enumerate(buf):
                            yield (t, g, stack[k])
                        buf = []
                if buf:
                    stack = jax.device_put(np.stack([b[2] for b in buf]))
                    for k, (t, g, _) in enumerate(buf):
                        yield (t, g, stack[k])

        return background_iter(_gen_dev())

    def _gen():
        with pf:
            for i, gray_u8, depth_u16 in pf:
                yield (
                    float(ts[start + i]),
                    gray_u8.astype(np.float32) / 255.0,
                    depth_u16.astype(np.float32) * scale,
                )

    return _gen()
