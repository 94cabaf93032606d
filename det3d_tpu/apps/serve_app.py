"""Streaming serving loop: the reference's ROS node, TPU-native.

Counterpart of reference ros_node.py:30-89: a producer thread feeds point
clouds into a bounded queue(2) (dropping stale frames, same backpressure
policy as the reference's `queue.Queue(maxsize=2)` + drop at :44-50), a
consumer loop runs the fused detector and reports running end-to-end
latency. `PointCloudServer` is transport-agnostic — `serve_synthetic` drives
it from a synthetic-scene generator at a fixed rate; a ROS transport would
only need to call `server.submit(points)` from its subscriber callback
(rospy isn't in this environment, so the ROS binding is gated behind
`make_ros_node`).
"""

from __future__ import annotations

import queue
import threading
import time

import jax
import numpy as np

from det3d_tpu.config import Config
from det3d_tpu.pipeline import Detector
from det3d_tpu.postprocess import to_annos


class ServeStats(list):
    """Latency list (seconds, what callers index/len) with the queue's
    submitted/dropped counters attached — the serving-envelope evidence
    (max drop-free Hz) needs drops, not just latencies."""

    submitted: int = 0
    dropped: int = 0


class PointCloudServer:
    """Bounded-queue streaming inference (reference ros_node.py:52-83)."""

    def __init__(
        self,
        cfg: Config,
        variables,
        *,
        detector: Detector | None = None,
        queue_size: int = 2,
        infer_fn=None,
    ):
        self.cfg = cfg
        self.detector = detector or Detector(cfg)
        # infer_fn override: e.g. the spatially-partitioned multi-chip path
        # from parallel.mesh.make_spatial_infer (same (variables, points,
        # num_points) -> Detections signature as Detector.infer_jit).
        # Resolved lazily so callers may swap self.detector post-init.
        self._infer_fn = infer_fn
        self.variables = variables
        self.queue: queue.Queue = queue.Queue(maxsize=queue_size)
        self.latencies: list[float] = []
        self.submitted = 0   # frames the sensor produced
        self.dropped = 0     # frames displaced from the full queue (stale)
        self._stop = threading.Event()

    def submit(self, points: np.ndarray, stamp: float | None = None) -> bool:
        """Producer side: enqueue a frame, dropping the oldest when full
        (the reference drops the new frame, ros_node.py:44-50; dropping the
        stale one is strictly better for a real-time consumer)."""
        item = (points, stamp if stamp is not None else time.perf_counter())
        self.submitted += 1
        try:
            self.queue.put_nowait(item)
            return True
        except queue.Full:
            try:
                self.queue.get_nowait()
                self.dropped += 1
            except queue.Empty:
                pass
            try:
                self.queue.put_nowait(item)
                return True
            except queue.Full:
                self.dropped += 1
                return False

    def stop(self) -> None:
        self._stop.set()

    @property
    def infer_fn(self):
        return self._infer_fn if self._infer_fn is not None else self.detector.infer_jit

    def warmup(self) -> None:
        pts = np.zeros((self.cfg.max_points, self.cfg.num_point_features), np.float32)
        jax.block_until_ready(
            self.infer_fn(self.variables, pts, np.int32(0))
        )

    def spin(self, max_frames: int | None = None, on_result=None) -> None:
        """Consumer loop (reference ros_node.py:61-83). After stop() the
        loop drains frames already queued (at most queue_size) before
        exiting — the sensor stopping must not discard what it produced."""
        served = 0
        while True:
            if max_frames is not None and served >= max_frames:
                break
            try:
                points, stamp = self.queue.get(timeout=0.5)
            except queue.Empty:
                if self._stop.is_set():
                    break
                continue
            padded, n = self.detector.pad_points(points)
            det = self.infer_fn(self.variables, padded, n)
            annos = to_annos(self.cfg, jax.device_get(det))
            latency = time.perf_counter() - stamp
            self.latencies.append(latency)
            served += 1
            if on_result is not None:
                on_result(annos, latency)
            if served % 20 == 0:
                avg = float(np.mean(self.latencies[-100:])) * 1e3
                print(f"served {served} frames, avg latency {avg:.1f} ms ({len(annos['name'])} dets)")


def _load_variables(cfg: Config, det: Detector, checkpoint: str | None):
    if checkpoint:
        from det3d_tpu.train.checkpoint import load_latest_state

        state = load_latest_state(cfg, checkpoint, det)
        return {"params": state.params, "batch_stats": state.batch_stats}
    return det.init_variables(jax.random.PRNGKey(0))


def _run_server(cfg: Config, producer_body, *, checkpoint, spatial) -> list[float]:
    """Shared serving scaffold: build detector(+spatial infer_fn)/server,
    warm up, run `producer_body(server)` in a daemon thread (server.stop()
    guaranteed on ANY exit, or spin() would wait forever; a producer
    exception re-raises in the caller after the drained frames are served
    — not swallowed by the thread), consume, print the latency
    percentiles. Both transports differ only in the producer."""
    infer_fn = None
    if spatial:
        from det3d_tpu.parallel.mesh import make_spatial_infer, make_spatial_mesh

        mesh = make_spatial_mesh()
        det, infer_fn = make_spatial_infer(cfg, mesh)
        print(f"serving spatially partitioned over {mesh.devices.size} devices")
    else:
        det = Detector(cfg)
    variables = _load_variables(cfg, det, checkpoint)
    server = PointCloudServer(cfg, variables, detector=det, infer_fn=infer_fn)
    server.warmup()

    failure: list[BaseException] = []

    def producer():
        try:
            producer_body(server)
        except BaseException as e:  # noqa: BLE001 — re-raised below
            failure.append(e)
        finally:
            server.stop()

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    server.spin()
    t.join()
    if failure:
        raise failure[0]
    lat = np.asarray(server.latencies) * 1e3
    if len(lat):
        print(
            f"latency over {len(lat)} frames: p50 {np.percentile(lat, 50):.1f} ms  "
            f"p95 {np.percentile(lat, 95):.1f} ms  max {lat.max():.1f} ms"
        )
    print(
        f"frames: submitted {server.submitted}, served {len(server.latencies)}, "
        f"dropped {server.dropped} (queue displaces stale frames when full)"
    )
    out = ServeStats(server.latencies)
    out.submitted, out.dropped = server.submitted, server.dropped
    return out


def serve_synthetic(
    cfg: Config,
    *,
    checkpoint: str | None = None,
    frames: int = 100,
    hz: float = 10.0,
    spatial: bool = False,
) -> list[float]:
    """Drive the server from a synthetic sensor at `hz` frames/sec.

    `spatial=True` serves each frame spatially partitioned over ALL visible
    devices (parallel/mesh.make_spatial_infer) — the multi-chip serving-
    latency mode."""
    from det3d_tpu.data.synthetic import sample_scene

    rng = np.random.RandomState(0)

    def producer_body(server):
        period = 1.0 / hz
        for _ in range(frames):
            if server._stop.is_set():
                return
            scene = sample_scene(cfg, rng)
            server.submit(scene["points"])
            time.sleep(period)

    return _run_server(cfg, producer_body, checkpoint=checkpoint, spatial=spatial)


def serve_replay(
    cfg: Config,
    replay_dir: str,
    *,
    checkpoint: str | None = None,
    hz: float = 10.0,
    frames: int | None = None,
    loop: bool = False,
    spatial: bool = False,
) -> list[float]:
    """Replay a directory of raw `.bin` point-cloud files through the server
    at a fixed rate — the real-IO counterpart of `serve_synthetic` and the
    headless stand-in for the reference's live ROS feed (ros_node.py:61-83:
    the spin loop consumes whatever the sensor produced last; here the
    sensor is the recorded drive).

    Disk reads + pad-to-max run in the C++ async loader's threads
    (runtime/pointcloud_loader.cc) ahead of the producer clock, so the
    `hz` pacing measures serving latency, not disk latency; falls back to
    `np.fromfile` when the native loader can't build. `loop=True` cycles
    the directory until `frames` have been submitted."""
    from pathlib import Path

    paths = sorted(Path(replay_dir).glob("*.bin"))
    if not paths:
        raise FileNotFoundError(f"no .bin files under {replay_dir}")
    if frames is not None and not loop:
        paths = paths[:frames]
    total = frames if (frames is not None and loop) else len(paths)

    from det3d_tpu.data import native_loader

    use_native = native_loader.available()
    print(
        f"replaying {total} frames from {replay_dir} at {hz} Hz "
        f"({'C++ async loader' if use_native else 'numpy fallback'})"
    )

    def frame_paths():
        i = 0
        while i < total:
            yield paths[i % len(paths)]
            i += 1

    def producer_body(server):
        period = 1.0 / hz
        if use_native:
            with native_loader.AsyncPointCloudLoader(
                cfg.max_points, cfg.num_point_features, num_threads=4
            ) as ld:
                pending = 0
                it = frame_paths()
                # keep the loader a few frames ahead of the clock
                for _ in range(min(4, total)):
                    ld.submit(next(it))
                    pending += 1
                submitted = pending
                while pending and not server._stop.is_set():
                    got = ld.next(missing_ok=True)
                    if got is None:
                        break
                    pts, n = got
                    pending -= 1
                    if submitted < total:
                        ld.submit(next(it))
                        pending += 1
                        submitted += 1
                    # the loader pads to max_points; the server re-pads, so
                    # hand it only the valid rows (same contract as ROS)
                    server.submit(pts[:n])
                    time.sleep(period)
        else:
            for p in frame_paths():
                if server._stop.is_set():
                    return
                pts = np.fromfile(p, np.float32).reshape(-1, cfg.num_point_features)
                server.submit(pts)
                time.sleep(period)

    return _run_server(cfg, producer_body, checkpoint=checkpoint, spatial=spatial)


def make_ros_node(cfg: Config, variables, topic: str = "/combined_lidar"):
    """ROS binding (only if rospy is importable; reference ros_node.py:30-59)."""
    import rospy  # noqa: F401  (gated: not present in this environment)
    import sensor_msgs.point_cloud2 as pc2
    from sensor_msgs.msg import PointCloud2

    server = PointCloudServer(cfg, variables)

    def callback(msg):
        pts = np.array(
            list(pc2.read_points(msg, field_names=("x", "y", "z", "intensity"))),
            np.float32,
        )
        server.submit(pts)

    rospy.init_node("det3d_tpu")
    rospy.Subscriber(topic, PointCloud2, callback, queue_size=1)
    return server
