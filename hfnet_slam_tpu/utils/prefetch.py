"""Pipelined frame extraction: overlap accelerator inference with host
tracking.

The reference overlaps GPU inference with CPU tracking implicitly — the
next frame's TensorRT inference starts while the previous frame's
tracking/mapping C++ still runs on other cores
(/root/reference/src/HFNetRTModel.cc:122-137 is called from the Frame
constructor on the caller thread, but the ~50 FPS README number assumes
the GPU is busy while the CPU works). Here the overlap is explicit and
first-class: a one-worker pipeline dispatches extraction (and its
device->host fetch) for frame i+lookahead while the caller tracks frame
i. JAX releases the GIL during device execution and transfers, so the
overlap is real in a single process.

Usage:
    for item, feats in pipeline_frames(lambda im: ext(im), frames):
        system.track_features(feats, ...)
"""
from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor


def pipeline_frames(extract_fn, frames, lookahead: int = 1):
    """Yield (frame, features) pairs with `extract_fn(frame)` for upcoming
    frames running on a background worker.

    extract_fn: callable(frame_item) -> features. It may block on device
      results (the blocking wait is exactly what gets overlapped).
    frames: iterable of frame items (images, (image, depth) tuples, ...).
    lookahead: how many frames to keep in flight (1 = double buffering;
      more only helps when extraction latency is jittery).
    """
    pool = ThreadPoolExecutor(max_workers=1,
                              thread_name_prefix="hfnet-extract")
    q: collections.deque = collections.deque()
    try:
        for item in frames:
            q.append((item, pool.submit(extract_fn, item)))
            if len(q) > lookahead:
                item0, fut = q.popleft()
                yield item0, fut.result()
        while q:
            item0, fut = q.popleft()
            yield item0, fut.result()
    finally:
        pool.shutdown(wait=True)
