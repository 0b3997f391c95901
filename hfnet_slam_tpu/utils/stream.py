"""Live frame-stream frontend (the reference's ROS node, rebuilt).

The reference ships ROS wrappers (Examples/ROS/HFNet_SLAM/src/ros_mono.cc,
ros_rgbd.cc, ros_mono_inertial.cc) whose whole job is: subscribe to live
image/IMU topics, convert the message to a cv::Mat, and call the matching
System::Track* entry point. A TPU deployment has no roscore; the same live
role is a plain TCP (or Unix-domain) socket protocol here — any producer
(camera driver, simulator, ROS bridge, another process) connects and
streams frames; per-frame tracking results stream back on the same
connection.

Wire format (one message = one JSON header line + raw payload bytes):

    {"type":"image","ts":3.21,"h":480,"w":752,"dtype":"uint8",
     "depth":false,"imu":[[ax,ay,az,wx,wy,wz,dt],...]}\n
    <h*w*itemsize little-endian bytes>                     (row-major)

- grayscale image frames: dtype uint8 or float32;
- RGB-D: send `"depth":true` with a float32 depth payload IMMEDIATELY
  after its image frame (same ts) — the pair is tracked together;
- mono-inertial: attach `imu` rows [ax ay az wx wy wz dt] covering
  (t_prev, t] to the image header (System::TrackMonocular's vImuMeas);
- `{"type":"end"}\n` finishes the session cleanly.

Each tracked frame answers with one JSON line:

    {"ts":3.21,"state":"OK","R":[[...]x3],"t":[x,y,z]}\n

(pose is the camera pose T_cw; `R`/`t` are null while not tracked).
"""
from __future__ import annotations

import json
import socket
import socketserver
import threading

import numpy as np


def _read_exact(rfile, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = rfile.read(n - len(buf))
        if not chunk:
            raise ConnectionError("stream closed mid-payload")
        buf += chunk
    return bytes(buf)


def _read_message(rfile):
    """One header line + payload. Returns (header dict, ndarray|None)."""
    line = rfile.readline()
    if not line:
        return None, None
    head = json.loads(line)
    if head.get("type") == "end":
        return head, None
    h, w = int(head["h"]), int(head["w"])
    dt = np.dtype(head.get("dtype", "uint8")).newbyteorder("<")
    payload = _read_exact(rfile, h * w * dt.itemsize)
    return head, np.frombuffer(payload, dt).reshape(h, w)


class SLAMStreamServer:
    """Serve a SLAMSystem over a socket (`ros_mono`/`ros_rgbd`/
    `ros_mono_inertial` in one). One client at a time drives tracking —
    the same single-caller contract as the reference's image callback."""

    def __init__(self, system, host="127.0.0.1", port=0):
        self.system = system
        srv_self = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                pending = None  # image waiting for its depth pair
                while True:
                    try:
                        head, arr = _read_message(self.rfile)
                    except (ConnectionError, json.JSONDecodeError, KeyError,
                            ValueError) as e:
                        self.wfile.write(json.dumps(
                            {"error": f"{type(e).__name__}: {e}"[:200]}
                        ).encode() + b"\n")
                        return
                    if head is None or head.get("type") == "end":
                        return
                    ts = float(head.get("ts", 0.0))
                    if head.get("depth"):
                        if pending is None or pending[0] != ts:
                            self.wfile.write(
                                b'{"error":"depth frame without matching '
                                b'image"}\n')
                            return
                        _, img, _ = pending
                        pending = None
                        st, R, t = srv_self.system.track_rgbd(
                            img, arr.astype(np.float32), ts)
                    elif srv_self._wants_depth():
                        pending = (ts, arr, head)
                        continue  # wait for the depth half of the pair
                    else:
                        imu = head.get("imu")
                        if imu:
                            st, R, t = srv_self.system.track_monocular_inertial(
                                arr, ts, np.asarray(imu, np.float32))
                        else:
                            st, R, t = srv_self.system.track_monocular(arr, ts)
                    self.wfile.write(srv_self._result_line(ts, st, R, t))
                    self.wfile.flush()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="hfnet-stream",
            daemon=True)
        self._thread.start()

    def _wants_depth(self) -> bool:
        # RGB-D mode iff the system carries a virtual-baseline depth config
        # AND the client declared depth frames; keep it simple — the client
        # controls pairing via the "depth" flag, mono clients never send it
        return getattr(self, "_rgbd", False)

    def set_rgbd(self, flag: bool = True):
        """Declare the session RGB-D: image frames buffer until their depth
        pair arrives (ros_rgbd.cc's synchronized image+depth callback)."""
        self._rgbd = bool(flag)

    def _result_line(self, ts, st, R, t) -> bytes:
        from ..slam.tracking import _STATE_NAMES

        out = {"ts": ts, "state": _STATE_NAMES.get(st, str(st)),
               "R": None if R is None else np.round(
                   np.asarray(R, np.float64), 6).tolist(),
               "t": None if t is None else np.round(
                   np.asarray(t, np.float64), 6).tolist()}
        return json.dumps(out).encode() + b"\n"

    @property
    def address(self):
        return self._server.server_address[:2]

    def close(self):
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)


class StreamClient:
    """Producer-side helper (what a camera driver / ROS bridge would embed):
    connect, push frames, read tracking results."""

    def __init__(self, host, port, timeout=30.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._rfile = self._sock.makefile("rb")

    def send_image(self, image, ts, imu=None, depth=None):
        """Send one frame (+ optional IMU rows and float32 depth map);
        returns the server's result dict for the tracked frame."""
        img = np.ascontiguousarray(image)
        head = {"type": "image", "ts": float(ts), "h": img.shape[0],
                "w": img.shape[1], "dtype": img.dtype.name}
        if imu is not None:
            head["imu"] = np.asarray(imu, np.float64).tolist()
        self._sock.sendall(json.dumps(head).encode() + b"\n"
                           + img.astype(img.dtype.newbyteorder("<"),
                                        copy=False).tobytes())
        if depth is not None:
            d = np.ascontiguousarray(depth, np.float32)
            dhead = {"type": "image", "ts": float(ts), "h": d.shape[0],
                     "w": d.shape[1], "dtype": "float32", "depth": True}
            self._sock.sendall(json.dumps(dhead).encode() + b"\n"
                               + d.astype("<f4", copy=False).tobytes())
        line = self._rfile.readline()
        if not line:
            raise ConnectionError("server closed the stream")
        return json.loads(line)

    def close(self):
        try:
            self._sock.sendall(b'{"type":"end"}\n')
        except OSError:
            pass
        self._rfile.close()
        self._sock.close()
