"""Async host pipeline: mapping/loop-closing off the tracking thread.

TPU-native replacement of the reference's thread trio
(/root/reference/src/System.cc:137-183: Tracking in the caller thread,
LocalMapping::Run and LoopClosing::Run each on a std::thread, global BA on
a transient fourth thread; hand-off by mutex-guarded keyframe queues,
LocalMapping.cc:317-322 / LoopClosing.cc:315-320).

Design here: TWO worker threads mirroring the reference's split — a
MappingWorker (LocalMapping::Run) and a LoopWorker (LoopClosing::Run).
Round 3 merged them into one thread; that starved triangulation whenever
place recognition ran (detection kernels block the mapping pipeline for
hundreds of ms, and tracking depends on fresh triangulated coverage
frame-to-frame). The reference's map-wide lock `Map::mMutexMapUpdate`
(include/Map.h:141, taken by Tracking each frame at Tracking.cc:1190)
becomes `map_lock`, an RLock with the same discipline:

  * the tracking thread holds it for the whole per-frame track() body;
  * worker-side host sections (gather problem inputs, write back results,
    propagate corrections) hold it;
  * the heavy jitted device solves (local BA, Sim3 RANSAC, pose graph,
    global BA) run WITHOUT it — they consume device copies made under the
    lock, so tracking overlaps exactly the work that dominates mapping
    latency. This is the reference's behavior: its LBA runs concurrently
    with tracking and is abortable (mbAbortBA, LocalMapping.cc:321).

JAX releases the GIL during device execution, so the overlap is real even
in a single process.
"""
from __future__ import annotations

import queue
import threading


class MappingWorker:
    """Consumes (store, kf) items; runs mapper + loop closer per keyframe."""

    def __init__(self, system):
        self.system = system
        self.q: queue.Queue = queue.Queue()
        self.map_lock = threading.RLock()
        self.exc = None
        self.processed = 0
        # pause protocol (LocalMapping::RequestStop, LocalMapping.cc:
        # 1013-1084): loop corrections pause MAPPING (never tracking) so
        # no BA write-back or triangulation interleaves a detached
        # pose-graph solve — keyframes keep queueing and are processed on
        # resume
        self._pause = threading.Event()
        self._busy = False
        self._thread = threading.Thread(
            target=self._run, name="hfnet-mapping", daemon=True)
        self._thread.start()

    # -- tracking-thread API ------------------------------------------------
    def enqueue(self, store, k: int):
        """LocalMapping::InsertKeyFrame analogue (queue push)."""
        self.q.put((store, int(k)))

    def queue_size(self) -> int:
        return self.q.qsize()

    # -- loop-closer API ----------------------------------------------------
    def request_pause(self, timeout: float = 30.0):
        """Pause processing between queue items and wait until any
        in-flight item finishes (RequestStop + isStopped handshake).
        Sets the mapper's BA abort flag so a long in-flight local BA yields
        quickly (the reference's mbAbortBA, Tracking.cc:2527)."""
        import time as _time

        self._pause.set()
        mapper = getattr(self.system, "mapper", None)
        if mapper is not None:
            mapper.abort_ba = True
        t0 = _time.monotonic()
        while self._busy and _time.monotonic() - t0 < timeout:
            _time.sleep(0.002)
        if self._busy:
            from ..utils.log import warn

            warn("MappingWorker.request_pause: in-flight keyframe did not "
                 f"finish within {timeout:.0f}s; correction proceeds "
                 "concurrently (staleness guards will discard conflicts)")

    def resume(self):
        """LocalMapping::Release analogue."""
        self._pause.clear()

    def drain(self):
        """Block until every queued keyframe is fully processed; re-raise a
        worker exception if one occurred (tests/shutdown path)."""
        self.q.join()
        if self.exc is not None:
            exc, self.exc = self.exc, None
            raise exc

    def stop(self):
        self.q.put(None)
        self._thread.join(timeout=30)

    # -- worker thread --------------------------------------------------------
    def _run(self):
        while True:
            item = self.q.get()
            if item is None:
                self.q.task_done()
                return
            store, k = item
            # _busy is set BEFORE checking the pause event, and re-checked
            # after: with the reverse order, request_pause() could set the
            # event and sample a stale _busy=False in the gap, returning
            # "paused" while this worker starts a full keyframe concurrent
            # with the detached pose-graph solve (advisor r4 finding #1)
            self._busy = True
            while self._pause.is_set():  # paused by a loop correction
                import time as _time

                self._busy = False
                _time.sleep(0.002)
                self._busy = True
            try:
                sys_ = self.system
                with self.map_lock:
                    stale = store is not sys_.store or not store.kf_valid[k]
                if not stale:
                    # defer the local BA while more keyframes are queued
                    # (the reference's !CheckNewKeyFrames() gate,
                    # LocalMapping.cc:140) so association stages keep pace
                    sys_.mapper.process_keyframe(
                        k, do_ba=self.q.qsize() == 0)
                    # hand the keyframe to the loop-closing thread
                    # (LocalMapping.cc:283); sync fallback runs inline
                    lw = getattr(sys_, "loop_worker", None)
                    if lw is not None:
                        lw.enqueue(store, k)
                    elif sys_.loop_closer is not None:
                        closed = sys_.loop_closer.process_keyframe(k)
                        if closed:
                            with self.map_lock:
                                # the map moved under the tracker; restart
                                # its motion model (Tracking does the same
                                # after CorrectLoop)
                                sys_.tracker.velocity = None
                    if sys_.vi is not None:
                        # staged IMU initialization on the worker
                        # (LocalMapping.cc:200-275 runs it on the mapping
                        # thread too). Holds the map lock: the rescale is
                        # a whole-map move the tracker must not interleave
                        with self.map_lock:
                            ts = float(store.kf_timestamp[k])
                            sys_.vi.maybe_initialize(ts)
                self.processed += 1
            except Exception as e:  # surfaced on the next drain()
                self.exc = e
            finally:
                self._busy = False
                self.q.task_done()


class LoopWorker:
    """LoopClosing thread (the reference spawns it at System.cc:160):
    consumes keyframes the mapping worker has finished, runs place
    recognition and (rarely) corrections. Separate from MappingWorker so a
    detection or correction never starves triangulation — tracking depends
    on fresh triangulated coverage frame-to-frame."""

    def __init__(self, system):
        self.system = system
        self.q: queue.Queue = queue.Queue()
        self.exc = None
        self.processed = 0
        self._thread = threading.Thread(
            target=self._run, name="hfnet-loop", daemon=True)
        self._thread.start()

    def enqueue(self, store, k: int):
        """LoopClosing::InsertKeyFrame analogue."""
        self.q.put((store, int(k)))

    def queue_size(self) -> int:
        return self.q.qsize()

    def drain(self):
        self.q.join()
        if self.exc is not None:
            exc, self.exc = self.exc, None
            raise exc

    def stop(self):
        self.q.put(None)
        self._thread.join(timeout=60)

    def _run(self):
        while True:
            item = self.q.get()
            if item is None:
                self.q.task_done()
                return
            # collapse backlog to the NEWEST queued keyframe: when place
            # recognition runs slower than keyframes arrive, detecting for
            # a minutes-old keyframe against the CURRENT map state produces
            # temporally inconsistent (false) corrections. The reference
            # tolerates lag because its detection is fast; on a slow host
            # skipping superseded keyframes is the faithful trade — the
            # newest KF carries the same place signal.
            items = [item]
            stop = False
            while True:
                try:
                    nxt = self.q.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    stop = True
                    break
                items.append(nxt)
            store, k = items[-1]
            try:
                sys_ = self.system
                lock = sys_.worker.map_lock
                with lock:
                    stale = store is not sys_.store or not store.kf_valid[k]
                if not stale and sys_.loop_closer is not None:
                    closed = sys_.loop_closer.process_keyframe(k)
                    if closed:
                        with lock:
                            # the map moved under the tracker; restart its
                            # motion model (Tracking does the same after
                            # CorrectLoop)
                            sys_.tracker.velocity = None
                self.processed += 1
            except Exception as e:  # surfaced on the next drain()
                self.exc = e
            finally:
                for _ in items:
                    self.q.task_done()
                if stop:
                    self.q.task_done()  # the sentinel's own get
                    return


class GBAWorker:
    """Detached, abortable global bundle adjustment — the reference's
    transient GBA thread (LoopClosing::RunGlobalBundleAdjustment,
    /root/reference/src/LoopClosing.cc:1123-1133, 1339-1374: mbRunningGBA,
    mbStopGBA, mnFullBAIdx).

    The loop closer submits a request after the (fast) Sim3 correction and
    returns immediately; the solve runs here, off both the tracking and the
    mapping threads. A NEW loop closing while a solve is in flight aborts
    it (the stale solve is discarded — its rounds were linearized on pre-
    correction geometry). Keyframes born during the solve are handled by
    run_global_ba's propagation (LoopClosing.cc:2440-2540)."""

    def __init__(self, mapper):
        self.mapper = mapper
        self.q: queue.Queue = queue.Queue()
        self._abort = threading.Event()
        self.full_ba_idx = 0      # completed solves (mnFullBAIdx)
        self.aborted = 0
        self.exc = None
        self._thread = threading.Thread(
            target=self._run, name="hfnet-gba", daemon=True)
        self._thread.start()

    def request(self, kind: str, **kw):
        """Queue a global solve ('visual' -> run_global_ba kwargs,
        'inertial' -> full_inertial_ba kwargs), aborting any in-flight one
        and superseding any still-queued one (CorrectLoop's
        mbStopGBA = true, LoopClosing.cc:1123)."""
        self.abort_inflight()
        stop_seen = False
        try:
            while True:  # a queued-but-unstarted solve is superseded
                stop_seen |= self.q.get_nowait() is None
                self.q.task_done()
        except queue.Empty:
            pass
        self.q.put((kind, kw))
        if stop_seen:  # never eat the stop sentinel
            self.q.put(None)

    def abort_inflight(self):
        self._abort.set()

    def drain(self):
        """Block until the queue is empty and the current solve finished;
        re-raise a worker exception if one occurred."""
        self.q.join()
        if self.exc is not None:
            exc, self.exc = self.exc, None
            raise exc

    def stop(self):
        self.abort_inflight()
        self.q.put(None)
        self._thread.join(timeout=60)

    def _run(self):
        while True:
            item = self.q.get()
            if item is None:
                self.q.task_done()
                return
            kind, kw = item
            self._abort.clear()
            aborted = self._abort.is_set  # fresh closure per request
            try:
                if kind == "inertial":
                    self.mapper.full_inertial_ba(self.mapper.vim,
                                                 should_abort=aborted, **kw)
                else:
                    self.mapper.run_global_ba(should_abort=aborted, **kw)
                if aborted():
                    self.aborted += 1
                else:
                    self.full_ba_idx += 1
            except Exception as e:  # surfaced on the next drain()
                self.exc = e
            finally:
                self.q.task_done()


class _NullLock:
    """No-op lock for the synchronous pipeline (zero overhead, and makes
    `with self.lock:` uniform across sync/async code paths)."""

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def acquire(self):
        pass

    def release(self):
        pass


NULL_LOCK = _NullLock()
