"""Driver config #5: 32-beam sparse clouds with augmentation (BASELINE.md).

The reference never exercises sparse-beam inputs; here a 64-beam KITTI
fixture sweep is ring-decimated to 32 beams (io_shim.subsample_beams) and
trained END TO END through the jitted augmented train step
(train.make_train_step(augment=True) -> device_augment -> fused forward)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from gndnet_tpu.config import load_config, sparse_32beam_config
from gndnet_tpu.io_shim import subsample_beams


def test_sparse_32beam_preset_registered():
    cfg = load_config("sparse_32beam")
    assert cfg.num_points == 50000
    assert cfg.grid_size == (100, 100, 1)  # same grid as kitti_sem


def test_subsample_beams_halves_fixture_scan(reference_fixture_dir):
    cloud = np.load(os.path.join(reference_fixture_dir, "reduced_velo",
                                 "000000.npy")).astype(np.float32)
    sparse = subsample_beams(cloud, num_beams=64, keep_every=2)
    # roughly half the points survive ring decimation
    assert 0.3 * len(cloud) < len(sparse) < 0.7 * len(cloud)
    # a strict subset of the original rows
    orig = {tuple(np.round(r, 4)) for r in cloud[::7, :3]}
    kept = sum(tuple(np.round(r, 4)) in orig for r in sparse[::7, :3])
    assert kept > 0
    # the two phases partition the cloud
    other = subsample_beams(cloud, num_beams=64, keep_every=2, phase=1)
    assert len(sparse) + len(other) == len(cloud)


def test_subsample_beams_synthetic_rings():
    """Synthetic 8-ring cloud: exactly the even rings survive."""
    rng = np.random.default_rng(0)
    rows = []
    for ring in range(8):
        elev = np.deg2rad(-20 + ring * 3.0)
        az = rng.uniform(0, 2 * np.pi, 100)
        r = 20.0
        rows.append(np.stack([
            r * np.cos(elev) * np.cos(az), r * np.cos(elev) * np.sin(az),
            np.full(100, r * np.sin(elev)), np.zeros(100)], axis=1))
    cloud = np.concatenate(rows).astype(np.float32)
    sparse = subsample_beams(cloud, num_beams=8, keep_every=2)
    zs = np.unique(np.round(sparse[:, 2], 3))
    assert len(zs) == 4  # 4 of the 8 rings


@pytest.mark.slow
def test_sparse_32beam_augmented_training_converges(reference_fixture_dir):
    """End-to-end: beam-decimated fixture scans through the jitted augmented
    train step; the loss must fall (driver config #5)."""
    import jax

    from gndnet_tpu.io_shim import random_sample, shift_cloud
    from gndnet_tpu.train import create_train_state, make_train_step

    cfg = sparse_32beam_config().replace(num_points=10000, batch_size=2)
    rng = np.random.default_rng(0)
    clouds, labels = [], []
    for name in ("000000", "000001"):
        cloud = np.load(os.path.join(reference_fixture_dir, "reduced_velo",
                                     f"{name}.npy")).astype(np.float32)
        cloud = shift_cloud(cloud, cfg.lidar_height)
        sparse = subsample_beams(cloud, num_beams=64, keep_every=2)
        assert len(sparse) < 0.7 * len(cloud)
        sampled = random_sample(sparse, cfg.num_points, rng)
        clouds.append(sampled[:, :cfg.input_features])
        labels.append(np.load(os.path.join(
            reference_fixture_dir, "gnd_labels", f"{name}.npy")
        ).astype(np.float32))
    points = jnp.asarray(np.stack(clouds))
    lab = jnp.asarray(np.stack(labels))

    model, tx, state = create_train_state(cfg, steps_per_epoch=10, seed=0)
    step = make_train_step(model, tx, cfg, augment=True)
    losses = []
    for _ in range(24):
        state, loss = step(state, points, lab)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # each step sees a different random rotation/height, so compare window
    # means rather than endpoints
    assert np.mean(losses[-6:]) < np.mean(losses[:6]) * 0.75, losses
