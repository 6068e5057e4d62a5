"""Inference: single-scan engine + free-wheeling streaming server.

Replaces the reference's two serving paths with one compiled program:

* `InferGround`-style single scan (reference: predict_ground.py:110-121):
  shift cloud -> voxelize -> forward.  Here the whole
  shift -> pillarize -> PFN -> scatter -> SegNet -> per-point threshold
  segmentation chain is ONE jitted XLA program; the host only moves a
  (N, F) array in and (ny, nx) + (N,) arrays out.

* the ROS node's decoupled inference thread (reference: ros_node.py:51-138):
  `StreamingEngine` reproduces the latest-value-mailbox pattern — a daemon
  thread free-wheels on the newest input, the producer never blocks, and
  consumers read the latest (possibly one frame stale) output — with the
  reference's synthetic-plane warmup standing in for CUDA warmup as an XLA
  compile priming step (ros_node.py:73-95).
"""

from __future__ import annotations

import threading
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from gndnet_tpu.config import GndNetConfig
from gndnet_tpu.models.gndnet import GroundEstimatorNet
from gndnet_tpu.ops.postproc import segment_cloud

_PAD_SENTINEL = 1e9  # pads bin far out of range -> seg label -1, no pillar


class GroundInferenceEngine:
    """Compiled scan -> (elevation map, per-point segmentation) engine.

    Args:
      cfg: model config.
      variables: flax variables ({'params', 'batch_stats'}).
      threshold: segmentation threshold (reference uses 0.08 in
        predict_ground.py:168, 0.0 in evaluate_SemanticKITTI.py:189, 0.16 in
        ros_node.py:274).
      shift_cloud: add cfg.lidar_height to z before inference (reference
        predict_ground.py:104-113); None uses cfg.shift_cloud.
      bucket: pad scans up to a multiple of this many points so arbitrary
        scan sizes hit a small set of compiled shapes.
    """

    QUANT_SCALE = 1.0 / 256.0   # 4 mm resolution, +-128 m range in int16

    def __init__(self, cfg: GndNetConfig, variables, threshold: float = 0.08,
                 shift_cloud: bool | None = None, bucket: int = 4096,
                 transfer_dtype: str = "float32",
                 transfer_features: int | None = None):
        """transfer_dtype='int16' ships scans as 4 mm fixed-point (half the
        host->device bytes; dequantized on device).  Use when the host link
        bounds throughput; quantization error (<=2 mm) is far below the
        segmentation thresholds and cell sizes.

        transfer_features=k ships only the leading k point columns (k >= 3,
        i.e. at least xyz) and zero-fills the rest ON DEVICE — e.g. drop the
        intensity column when the link is the bottleneck (the model then
        sees intensity 0; the reference itself feeds fake zero features to
        xyz-only .bin scans, predict_ground.py:129-131).  Default ships all
        cfg.input_features columns."""
        if transfer_dtype not in ("float32", "int16"):
            raise ValueError(f"unsupported transfer_dtype {transfer_dtype!r}")
        k = cfg.input_features if transfer_features is None \
            else int(transfer_features)
        if not 3 <= k <= cfg.input_features:
            raise ValueError(
                f"transfer_features must be in [3, {cfg.input_features}], "
                f"got {transfer_features}")
        self.cfg = cfg
        self.threshold = float(threshold)
        self.shift = cfg.shift_cloud if shift_cloud is None else shift_cloud
        self.bucket = bucket
        self.transfer_dtype = transfer_dtype
        self.transfer_features = k
        self.model = GroundEstimatorNet(cfg)
        self._variables = variables
        self._fn = self._build()

    def _build(self) -> Callable:
        cfg = self.cfg
        shift = jnp.asarray(
            [0.0, 0.0, cfg.lidar_height if self.shift else 0.0]
            + [0.0] * (cfg.input_features - 3), jnp.float32)
        grid_range = cfg.grid_range
        cell = cfg.voxel_size[0]
        thr = self.threshold

        quant = self.transfer_dtype == "int16"
        missing = cfg.input_features - self.transfer_features

        def run(variables, points):
            if quant:
                points = points.astype(jnp.float32) * self.QUANT_SCALE
            if missing:
                points = jnp.pad(points, ((0, 0), (0, missing)))
            pts = points + shift
            pred = self.model.apply(
                variables, pts[None], train=False,
                method=GroundEstimatorNet.fused)[0]        # (ny, nx)
            # reference segments with elevation_map=pred.T and the ORIGINAL
            # (unshifted) cloud z when loading .bin scans is pre-shifted by
            # InferGround itself; we match its post-shift comparison
            # (predict_ground.py:168 passes `points` already shifted at :135).
            labels = segment_cloud(pts, grid_range, cell, pred.T, thr)
            # int8 labels quarter the device->host traffic; values {-1, 0, 1}.
            return pred, labels.astype(jnp.int8)

        self._run = run   # unjitted, for callers composing larger programs
        self._jit = jax.jit(run)
        return self._jit

    def _pad(self, points: np.ndarray) -> np.ndarray:
        n = points.shape[0]
        target = max(self.bucket, -(-n // self.bucket) * self.bucket)
        if n != target:
            pad = np.full((target - n, points.shape[1]), _PAD_SENTINEL,
                          points.dtype)
            points = np.concatenate([points, pad])
        if self.transfer_dtype == "int16":
            points = np.clip(np.rint(points / self.QUANT_SCALE),
                             -32768, 32767).astype(np.int16)
        return points

    def _prepare(self, points: np.ndarray) -> tuple:
        points = np.asarray(points, np.float32)
        k = self.transfer_features
        if points.shape[1] < k:
            points = np.concatenate(
                [points, np.zeros((points.shape[0], k - points.shape[1]),
                                  np.float32)], axis=1)
        return self._pad(points[:, :k]), points.shape[0]

    def transfer_bytes(self, n_points: int) -> int:
        """Host->device bytes one scan of n_points costs through this
        engine's transfer configuration (after bucket padding)."""
        padded = max(self.bucket, -(-n_points // self.bucket) * self.bucket)
        item = 2 if self.transfer_dtype == "int16" else 4
        return padded * self.transfer_features * item

    def infer_async(self, points: np.ndarray) -> tuple:
        """Non-blocking submit: returns (n, pred_dev, labels_dev) device
        arrays immediately (JAX async dispatch).  Interleave several
        infer_async calls before materializing to overlap host<->device
        transfers with compute (the serving fast path)."""
        padded, n = self._prepare(points)
        pred, labels = self._fn(self._variables, padded)
        return n, pred, labels

    def infer(self, points: np.ndarray) -> tuple:
        """points: (N, >=3) float32 (extra feature columns beyond
        cfg.input_features are ignored; missing ones zero-padded).
        Returns (elevation (ny, nx) np.float32, labels (N,) np.int8
        with values {1: obstacle, 0: ground, -1: out of grid})."""
        n, pred, labels = self.infer_async(points)
        return np.asarray(pred), np.asarray(labels)[:n]

    def infer_pipelined(self, scans, depth: int = 3):
        """Generator yielding (elevation, labels) per scan with a `depth`-deep
        dispatch pipeline so transfer and compute overlap across scans —
        sustained-throughput serving (the measured path of bench.py)."""
        from collections import deque

        inflight = deque()
        for scan in scans:
            inflight.append(self.infer_async(scan))
            if len(inflight) >= depth:
                n, pred, labels = inflight.popleft()
                yield np.asarray(pred), np.asarray(labels)[:n]
        while inflight:
            n, pred, labels = inflight.popleft()
            yield np.asarray(pred), np.asarray(labels)[:n]

    def infer_many(self, scans) -> list:
        """Batched host-fed inference: ship K scans as ONE stacked array and
        run ONE dispatch, amortizing the per-dispatch transport cost across
        K scans (this dev environment's relay charges a fixed ~25 ms per
        dispatch — scripts/probe_quantum.py — which alone caps a
        one-scan-per-dispatch loop at ~40 Hz regardless of bytes; a real
        PCIe host charges ~us).  All scans must share one padded bucket
        shape.  Latency grows to the K-scan window; sustained rate
        approaches the link's bytes/s ceiling.  Returns
        [(elevation, labels), ...] in submission order."""
        prepared = [self._prepare(s) for s in scans]
        shapes = {p.shape for p, _ in prepared}
        if len(shapes) != 1:
            raise ValueError(f"scans fall into mixed buckets {shapes}; "
                             "pad or split the burst")
        stack = np.stack([p for p, _ in prepared])
        preds, labels = self._run_many(self._variables, stack)
        preds = np.asarray(preds)
        labels = np.asarray(labels)
        return [(preds[i], labels[i][:n])
                for i, (_, n) in enumerate(prepared)]

    @property
    def _run_many(self):
        fn = getattr(self, "_run_many_jit", None)
        if fn is None:
            cfg = self.cfg
            shift = jnp.asarray(
                [0.0, 0.0, cfg.lidar_height if self.shift else 0.0]
                + [0.0] * (cfg.input_features - 3), jnp.float32)
            quant = self.transfer_dtype == "int16"
            missing = cfg.input_features - self.transfer_features
            seg = jax.vmap(
                lambda p, e: segment_cloud(p, cfg.grid_range,
                                           cfg.voxel_size[0], e.T,
                                           self.threshold))

            def run_many(variables, points):       # (K, N, k_features)
                if quant:
                    points = points.astype(jnp.float32) * self.QUANT_SCALE
                if missing:
                    points = jnp.pad(points, ((0, 0), (0, 0), (0, missing)))
                pts = points + shift
                pred = self.model.apply(variables, pts, train=False,
                                        method=GroundEstimatorNet.fused)
                return pred, seg(pts, pred).astype(jnp.int8)

            fn = jax.jit(run_many)
            self._run_many_jit = fn
        return fn

    def _example_input(self, n: int | None = None) -> np.ndarray:
        """A padded input of the shape the engine serves (for AOT compiles)."""
        n = n or self.cfg.num_points
        pts = np.zeros((n, self.transfer_features), np.float32)
        return self._pad(pts)

    def aot_save(self, path: str, n: int | None = None) -> int:
        """Ahead-of-time compile the serving program for the engine's padded
        scan shape and write a single-file executable artifact (no re-trace /
        re-lower / re-compile on load — the XLA analog of shipping a
        TensorRT engine).  Returns artifact bytes.  See
        utils/compile_cache.py for the format and its stability caveats."""
        from gndnet_tpu.utils.compile_cache import save_compiled

        example = self._example_input(n)
        compiled = self._jit.lower(self._variables, example).compile()
        return save_compiled(path, compiled, meta={
            "example_shape": tuple(example.shape),
            "example_dtype": str(example.dtype),
            "transfer_dtype": self.transfer_dtype,
        })

    def aot_load(self, path: str) -> None:
        """Serve from an `aot_save` artifact: scans whose padded shape matches
        the shape the artifact was COMPILED for (recorded in the artifact —
        aot_save may have used a custom n) run the preloaded executable
        (zero compile cost, even on first call); any other shape falls back
        to the normal jit path."""
        from gndnet_tpu.utils.compile_cache import load_compiled

        loaded, meta = load_compiled(path, return_meta=True)
        saved_transfer = meta.get("transfer_dtype", self.transfer_dtype)
        if saved_transfer != self.transfer_dtype:
            raise ValueError(
                f"AOT artifact was compiled for transfer_dtype="
                f"{saved_transfer!r}, engine uses {self.transfer_dtype!r}")
        jit_fn = self._jit
        # artifacts from before the meta field: assume the default shape
        shape = tuple(meta.get("example_shape",
                               self._example_input().shape))

        def dispatch(variables, padded):
            if padded.shape == shape:
                return loaded(variables, padded)
            return jit_fn(variables, padded)

        self._fn = dispatch

    def warmup(self, n: int | None = None) -> float:
        """Prime the XLA compile with a synthetic flat-plane scan (the
        reference's `dryrun`, ros_node.py:73-95).  Returns compile seconds."""
        n = n or self.cfg.num_points
        rng = np.random.default_rng(0)
        pts = np.zeros((n, self.cfg.input_features), np.float32)
        pts[:, 0] = rng.uniform(self.cfg.pc_range[0], self.cfg.pc_range[3], n)
        pts[:, 1] = rng.uniform(self.cfg.pc_range[1], self.cfg.pc_range[4], n)
        pts[:, 2] = -self.cfg.lidar_height
        t0 = time.time()
        # _prepare (not _pad): it slices to transfer_features — _pad alone
        # would ship the full-width cloud and the device-side zero-fill
        # would then overshoot input_features (caught by bench --mode
        # stream --features 3)
        padded, _ = self._prepare(pts)
        pred, labels = self._fn(self._variables, padded)
        jax.block_until_ready((pred, labels))
        return time.time() - t0


class StreamingEngine:
    """Latest-value-mailbox streaming server around a GroundInferenceEngine.

    Free-wheeling daemon thread: always processes the newest submitted scan,
    dropping stale ones (reference InferenceThread, ros_node.py:51-138).
    `submit` never blocks; `latest` returns the newest completed result (or
    None before the first inference finishes)."""

    def __init__(self, engine: GroundInferenceEngine, warmup: bool = True,
                 use_native_mailbox: bool | None = None):
        self.engine = engine
        self._in_lock = threading.Lock()
        self._input = None
        self._input_seq = 0
        self._out_lock = threading.Lock()
        self._output = None
        self._output_seq = 0
        self._event = threading.Event()
        self._running = False
        self._thread = None
        self.processed = 0
        self.errors = 0

        # Input hand-off: prefer the lock-free native triple buffer (the
        # memcpy runs outside the GIL; producer never blocks) with the python
        # lock as fallback (native/gndnet_host.cpp mailbox_*).
        self._mailbox = None
        self._mailbox_shape = None
        if use_native_mailbox is not False:
            try:
                from gndnet_tpu import native

                if native.available():
                    f = engine.cfg.input_features
                    cap = (engine.cfg.num_points * 4 + engine.bucket) * f * 4
                    self._mailbox = native.NativeMailbox(cap)
                    self._mailbox_out = np.zeros(cap, np.uint8)
            except Exception:
                if use_native_mailbox:
                    raise
                self._mailbox = None
        if warmup:
            self.compile_seconds = engine.warmup()

    def start(self):
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._running = False
        self._event.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if self._mailbox is not None:
            self._mailbox.close()
            self._mailbox = None

    def submit(self, points: np.ndarray) -> int:
        """Hand a new scan to the engine (non-blocking); returns its seq no."""
        if self._mailbox is not None:
            pts = np.ascontiguousarray(points, np.float32)
            header = np.asarray(pts.shape, np.int64)
            payload = np.concatenate(
                [header.view(np.uint8).reshape(-1),
                 pts.view(np.uint8).reshape(-1)])
            try:
                seq = self._mailbox.write(payload)
            except ValueError:
                seq = None  # oversized scan: fall through to the lock path
            if seq is not None:
                with self._in_lock:
                    self._input_seq = seq
                self._event.set()
                return seq
        with self._in_lock:
            self._input_seq += 1
            self._input = (self._input_seq, points)
        self._event.set()
        return self._input_seq

    def latest(self):
        """Newest completed (seq, elevation, labels) or None.

        May lag `submit` by one scan — the reference reads possibly-stale
        output the same way (ros_node.py:268-270)."""
        with self._out_lock:
            return self._output

    def _poll_input(self):
        """Newest unseen scan as (seq, points) or None."""
        if self._mailbox is not None:
            n, seq = self._mailbox.read_latest(self._mailbox_out)
            if n > 0:
                header = self._mailbox_out[:16].view(np.int64)
                pts = self._mailbox_out[16:n].view(np.float32).reshape(
                    int(header[0]), int(header[1])).copy()
                return seq, pts
        with self._in_lock:
            item, self._input = self._input, None
        return item

    def _loop(self):
        while self._running:
            self._event.wait(timeout=0.1)
            self._event.clear()
            item = self._poll_input()
            if item is None:
                continue
            seq, points = item
            try:
                pred, labels = self.engine.infer(points)
            except Exception:   # keep serving (reference ros_node.py:116-120)
                self.errors += 1
                continue
            with self._out_lock:
                self._output = (seq, pred, labels)
                self._output_seq = seq
            self.processed += 1
