"""Fine-grid stress configuration: odd pseudo-image dimensions.

BASELINE.md driver config #3 is 0.4 m cells / 250x250 pseudo-image; 250 pools
to 125 (odd) then 62 with torch floor semantics — this exercises the odd-size
pool/unpool path through the whole model.  Tests use a scaled-down odd grid
(10x10 -> 5 -> 2) for CPU speed; shape algebra is identical.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from gndnet_tpu.config import GndNetConfig, fine_grid_config
from gndnet_tpu.models.gndnet import GroundEstimatorNet, init_model
from gndnet_tpu.train import create_train_state, make_train_step

ODD = GndNetConfig(
    pc_range=(0.0, 0.0, -4.0, 10.0, 10.0, 4.0),   # 10 x 10 grid: 10->5->2
    grid_range=(0.0, 0.0, 10.0, 10.0),
    voxel_size=(1.0, 1.0, 8.0),
    max_points_voxel=10,
    max_voxels=128,
    input_features=4,
    batch_size=2,
)


def test_fine_grid_config_shape():
    cfg = fine_grid_config()
    assert cfg.grid_size == (250, 250, 1)


@pytest.mark.slow
def test_odd_grid_forward_and_train(rng):
    model, variables = init_model(ODD)
    pts = rng.uniform(0.2, 9.8, (2, 400, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-1, 0, (2, 400))
    out = model.apply(variables, jnp.asarray(pts), train=False,
                      method=GroundEstimatorNet.fused)
    assert out.shape == (2, 10, 10)
    assert np.isfinite(np.asarray(out)).all()

    model, tx, state = create_train_state(ODD, steps_per_epoch=5)
    step = make_train_step(model, tx, ODD)
    labels = jnp.zeros((2, 10, 10), jnp.float32)
    losses = []
    for _ in range(10):
        state, loss = step(state, jnp.asarray(pts), labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_odd_grid_segnet_matches_torch(rng):
    """The odd-size pool/unpool path through the full SegNet vs torch."""
    from gndnet_tpu.checkpoint import export_torch_state_dict
    from test_models import randomized_variables, torch_segnet_eval

    model, variables = randomized_variables(ODD, rng, seed=5)
    sd = export_torch_state_dict(variables, ODD)
    canvas = rng.normal(size=(2, 10, 10, 64)).astype(np.float32)

    from gndnet_tpu.models.segnet import SegnetGndEst

    seg = SegnetGndEst(in_channels=64)
    sv = {"params": variables["params"]["encoder_decoder"],
          "batch_stats": variables["batch_stats"]["encoder_decoder"]}
    got = np.asarray(seg.apply(sv, jnp.asarray(canvas), train=False))[..., 0]
    want = torch_segnet_eval(
        torch.from_numpy(canvas).permute(0, 3, 1, 2), sd).squeeze(1).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
