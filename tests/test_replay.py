"""Streaming replay harness tests (serving/replay.py)."""

import numpy as np

from gndnet_tpu.config import GndNetConfig
from gndnet_tpu.infer import GroundInferenceEngine
from gndnet_tpu.models.gndnet import init_model
from gndnet_tpu.serving.replay import replay, replay_device

CFG = GndNetConfig(
    pc_range=(0.0, -8.0, -4.0, 16.0, 8.0, 4.0),
    grid_range=(0.0, -8.0, 16.0, 8.0),
    voxel_size=(1.0, 1.0, 8.0),
    max_points_voxel=10,
    max_voxels=128,
    input_features=4,
    num_points=256,
)


def scans(rng, k=4, n=250):
    out = []
    for _ in range(k):
        s = np.zeros((n, 4), np.float32)
        s[:, 0] = rng.uniform(0.2, 15.8, n)
        s[:, 1] = rng.uniform(-7.8, 7.8, n)
        s[:, 2] = rng.uniform(-2, 0, n)
        out.append(s)
    return out


def test_feedforward_replay(rng):
    _, variables = init_model(CFG)
    engine = GroundInferenceEngine(CFG, variables, bucket=256)
    rep = replay(engine, scans(rng), target_hz=0.0, repeat=2)
    assert rep.scans_submitted == 8
    # feed-forward waits per scan: nothing dropped
    assert rep.scans_processed == 8
    assert rep.drop_fraction == 0.0
    assert rep.sustained_hz > 0
    assert rep.latency_ms_p50 > 0
    d = rep.as_dict()
    assert "compile_seconds" in d


def test_device_resident_replay_freewheel(rng):
    """replay_device (driver config #4 harness): device-staged scans, host
    submit clock + host result fetch; free-wheel mode processes every tick
    with zero drops and reports positive latency percentiles."""
    _, variables = init_model(CFG)
    engine = GroundInferenceEngine(CFG, variables, bucket=256)
    rep = replay_device(engine, scans(rng)[0], target_hz=0.0, n_ticks=12,
                        ring=4)
    assert rep.scans_submitted == 12
    assert rep.scans_processed == 12
    assert rep.drop_fraction == 0.0
    assert rep.sustained_hz > 0
    assert rep.latency_ms_p99 >= rep.latency_ms_p50 > 0


def test_device_resident_replay_paced(rng):
    """Paced mode: a sensible target rate on the tiny CPU model sustains
    with few drops; an absurd rate drops instead of queueing unboundedly."""
    _, variables = init_model(CFG)
    engine = GroundInferenceEngine(CFG, variables, bucket=256)
    rep = replay_device(engine, scans(rng)[0], target_hz=20.0, n_ticks=20,
                        ring=4)
    assert rep.scans_submitted == 20
    assert rep.scans_processed + int(rep.drop_fraction * 20) <= 20
    assert rep.scans_processed >= 1
    fast = replay_device(engine, scans(rng)[0], target_hz=5000.0, n_ticks=40,
                         ring=4)
    assert fast.scans_processed >= 1
    assert fast.scans_processed + fast.drop_fraction * 40 <= 40.01


def test_paced_replay_drops_when_overloaded(rng):
    """At an absurd target rate the mailbox must drop stale scans rather
    than queue them (latest-value semantics)."""
    _, variables = init_model(CFG)
    engine = GroundInferenceEngine(CFG, variables, bucket=256)
    rep = replay(engine, scans(rng, k=30), target_hz=2000.0, repeat=1)
    assert rep.scans_submitted == 30
    assert rep.scans_processed <= 30
    assert rep.scans_processed >= 1
