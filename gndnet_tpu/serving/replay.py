"""Streaming replay benchmark: sustained-rate scan feed through the engine.

Reproduces the reference's deployment pattern (sensor-rate callback feeding a
free-wheeling inference thread, reference: ros_node.py:51-138, 250-284) as a
measurable harness: scans are replayed at `target_hz` (or as fast as possible
with target_hz=0), the engine free-wheels on the newest scan, and we report
sustained processed rate, drop rate and latency percentiles — the
"55+ Hz sustained streaming replay" driver config (BASELINE.md #4).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np

from gndnet_tpu.infer import GroundInferenceEngine, StreamingEngine


@dataclass
class ReplayReport:
    scans_submitted: int
    scans_processed: int
    wall_seconds: float
    sustained_hz: float        # processed / wall
    submit_hz: float
    drop_fraction: float
    latency_ms_p50: float
    latency_ms_p99: float
    compile_seconds: float

    def as_dict(self):
        return self.__dict__.copy()


def replay_device(engine: GroundInferenceEngine, scan, target_hz: float = 55.0,
                  n_ticks: int = 512, ring: int = 32,
                  depth: int = 2) -> ReplayReport:
    """Sustained-rate replay with a DEVICE-RESIDENT scan feed (driver
    config #4, BASELINE.md: "55+ Hz sustained streaming replay").

    This dev environment reaches the TPU through a ~30 MB/s relay, so a
    host-fed replay measures the tunnel (1.6 MB/scan caps it at ~19 Hz) —
    see `replay`.  On a production host the PCIe DMA link is not the
    bottleneck; this mode reproduces that situation by pre-staging `ring`
    distinct device-resident scans (same trick as bench.py's device mode)
    while keeping the SUBMIT CLOCK and the RESULT FETCH on the host: every
    tick the host dispatches the compiled engine on the next staged buffer,
    and each scan's full outputs (elevation map + int8 labels) are pulled
    back to host memory, so drops, sustained rate and latency percentiles
    reflect real sensor-rate scheduling, not just raw device throughput.

    Drop semantics match the reference's latest-value mailbox
    (ros_node.py:51-138): with `depth` results in flight (one executing +
    queued), a sensor tick finds the engine busy and the frame is dropped.
    target_hz=0 free-wheels (submit the moment a slot frees; zero drops by
    construction).

    Dev-relay ceiling (measured): the relay serializes dispatches at its
    ~25 ms per-call quantum and does NOT pipeline queued ones — paced-55
    sustained stays ~9-10 Hz at depth 2/4/8/16 while p50 latency grows
    linearly with depth (459/926/1680 ms), so deeper queues buy nothing
    here.  The quantum is the tunnel's, not the chip's (the same engine
    sustains 1027 Hz from a device-resident ring, bench.py device mode);
    on a production PCIe host the submit path is ~us-scale and the 55 Hz
    requirement leaves ~18x headroom.
    """
    import jax
    import jax.numpy as jnp

    padded, n_real = engine._prepare(scan)
    base = jax.device_put(jnp.asarray(padded))

    @jax.jit
    def make_ring(base):
        # distinct per-slot z jitter built on device (one 4 mm quant per
        # slot for int16 transfer; 0.1 mm per slot for float) so XLA cannot
        # CSE the ring down to one scan
        step = 1 if base.dtype == jnp.int16 else 1e-4
        jit_z = jnp.arange(ring, dtype=base.dtype)[:, None, None] * step
        sel = jnp.zeros((base.shape[-1],), base.dtype).at[2].set(1)
        return base[None] + jit_z * sel

    staged = jax.block_until_ready(make_ring(base))
    fn = engine._fn

    t0 = time.perf_counter()
    out = fn(engine._variables, staged[0])
    np.asarray(out[0]); np.asarray(out[1])          # compile + first fetch
    compile_seconds = time.perf_counter() - t0

    period = 1.0 / target_hz if target_hz > 0 else 0.0
    inflight: list = []          # (submit_time, pred_dev, labels_dev)
    latencies: list = []
    submitted = processed = drops = 0

    def drain_ready(block: bool = False):
        nonlocal processed
        while inflight:
            ts, pred, labels = inflight[0]
            if not block and not (pred.is_ready() and labels.is_ready()):
                return
            np.asarray(pred); np.asarray(labels)     # host fetch (real output)
            latencies.append(time.perf_counter() - ts)
            inflight.pop(0)
            processed += 1

    t_start = time.perf_counter()
    next_due = t_start
    for i in range(n_ticks):
        if period:
            # sensor clock: poll results at fine grain while waiting
            while True:
                now = time.perf_counter()
                if now >= next_due:
                    break
                drain_ready()
                time.sleep(min(0.0005, next_due - now))
            next_due += period
        else:
            drain_ready(block=len(inflight) >= depth)
        drain_ready()
        submitted += 1
        if len(inflight) >= depth:
            drops += 1              # engine busy: sensor frame discarded
            continue
        pred, labels = fn(engine._variables, staged[i % ring])
        inflight.append((time.perf_counter(), pred, labels))
    drain_ready(block=True)
    wall = time.perf_counter() - t_start

    lat = np.asarray(latencies) * 1e3 if latencies else np.asarray([0.0])
    return ReplayReport(
        scans_submitted=submitted,
        scans_processed=processed,
        wall_seconds=wall,
        sustained_hz=processed / wall if wall else 0.0,
        submit_hz=submitted / wall if wall else 0.0,
        drop_fraction=drops / max(submitted, 1),
        latency_ms_p50=float(np.percentile(lat, 50)),
        latency_ms_p99=float(np.percentile(lat, 99)),
        compile_seconds=compile_seconds,
    )


def replay(engine: GroundInferenceEngine, scans, target_hz: float = 0.0,
           repeat: int = 1) -> ReplayReport:
    """Replay `scans` (list of (N, F) arrays) `repeat` times at `target_hz`.

    target_hz == 0 means feed-forward: submit the next scan the moment the
    previous result lands (pure engine throughput, zero drops)."""
    streaming = StreamingEngine(engine, warmup=True).start()
    latencies = []
    submitted = 0
    t_start = time.perf_counter()
    period = 1.0 / target_hz if target_hz > 0 else 0.0
    next_due = t_start
    try:
        for _ in range(repeat):
            for scan in scans:
                if period:
                    now = time.perf_counter()
                    if now < next_due:
                        time.sleep(next_due - now)
                    next_due += period
                t0 = time.perf_counter()
                seq = streaming.submit(scan)
                submitted += 1
                if not period:
                    # feed-forward: wait for THIS scan's result
                    while True:
                        out = streaming.latest()
                        if out is not None and out[0] >= seq:
                            break
                        time.sleep(0.0002)
                    latencies.append(time.perf_counter() - t0)
        if period:
            # drain the last in-flight scan
            deadline = time.perf_counter() + 2.0
            while streaming.processed < submitted - streaming.errors \
                    and time.perf_counter() < deadline:
                out = streaming.latest()
                if out is not None and out[0] >= submitted:
                    break
                time.sleep(0.001)
        wall = time.perf_counter() - t_start
    finally:
        streaming.stop()

    lat = np.asarray(latencies) * 1e3 if latencies else np.asarray([0.0])
    return ReplayReport(
        scans_submitted=submitted,
        scans_processed=streaming.processed,
        wall_seconds=wall,
        sustained_hz=streaming.processed / wall if wall else 0.0,
        submit_hz=submitted / wall if wall else 0.0,
        drop_fraction=1.0 - streaming.processed / max(submitted, 1),
        latency_ms_p50=float(np.percentile(lat, 50)),
        latency_ms_p99=float(np.percentile(lat, 99)),
        compile_seconds=streaming.compile_seconds,
    )
