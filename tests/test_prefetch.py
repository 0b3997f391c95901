"""Pipelined extraction (utils/prefetch.py): ordering, overlap, laziness,
and error propagation — the explicit version of the reference's implicit
GPU-inference / CPU-tracking overlap (HFNetRTModel::Run on the Frame
constructor's caller thread while other cores keep mapping)."""
import threading
import time

import pytest

from hfnet_slam_tpu.utils.prefetch import pipeline_frames


class TestPipelineFrames:
    def test_order_and_completeness(self):
        out = list(pipeline_frames(lambda x: x * 10, range(7), lookahead=2))
        assert out == [(i, i * 10) for i in range(7)]

    def test_overlap_is_real(self):
        """While the consumer 'tracks' frame i, the worker must already be
        extracting frame i+1: with extraction and consumption both 20 ms,
        a serial loop takes >= n*40 ms, the pipeline ~ n*20 ms."""
        def extract(i):
            time.sleep(0.02)
            return i

        t0 = time.perf_counter()
        n = 8
        for _, _f in pipeline_frames(extract, range(n)):
            time.sleep(0.02)  # host tracking work
        dt = time.perf_counter() - t0
        assert dt < n * 0.04 * 0.85  # clearly faster than serial

    def test_lazy_consumption_of_infinite_stream(self):
        """The pipeline must not drain the iterable ahead of the consumer
        beyond `lookahead` (frames can be a live camera stream)."""
        pulled = []

        def gen():
            i = 0
            while True:
                pulled.append(i)
                yield i
                i += 1

        it = pipeline_frames(lambda x: x, gen(), lookahead=1)
        for _ in range(3):
            next(it)
        # consumed 3, so at most 3 + lookahead + 1 in-flight pulls
        assert len(pulled) <= 5
        it.close()

    def test_worker_exception_reaches_consumer(self):
        def extract(i):
            if i == 2:
                raise ValueError("bad frame")
            return i

        with pytest.raises(ValueError, match="bad frame"):
            list(pipeline_frames(extract, range(4)))

    def test_worker_thread_cleaned_up(self):
        before = {t.name for t in threading.enumerate()}
        list(pipeline_frames(lambda x: x, range(3)))
        time.sleep(0.05)
        after = [t for t in threading.enumerate()
                 if t.name.startswith("hfnet-extract")
                 and t.name not in before and t.is_alive()]
        assert after == []
