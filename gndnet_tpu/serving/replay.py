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
