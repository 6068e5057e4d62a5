"""Orbax CheckpointManager + torch .pth.tar interchange tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from gndnet_tpu.checkpoint import (
    CheckpointManager,
    load_torch_checkpoint,
)
from gndnet_tpu.config import GndNetConfig
from gndnet_tpu.models.gndnet import init_model

CFG = GndNetConfig(
    pc_range=(0.0, -8.0, -4.0, 16.0, 8.0, 4.0),
    grid_range=(0.0, -8.0, 16.0, 8.0),
    voxel_size=(1.0, 1.0, 8.0),
    max_points_voxel=8,
    max_voxels=64,
    input_features=3,
    use_norm=False,
)


def tree_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for path, leaf in fa:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(fb[path]))


def test_manager_save_restore_latest_best(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(0)}
    mgr.save(1, {"state": state, "lowest_loss": 0.5}, is_best=True)
    state2 = {"w": state["w"] * 2, "step": jnp.asarray(1)}
    mgr.save(2, {"state": state2, "lowest_loss": 0.5}, is_best=False)
    state3 = {"w": state["w"] * 3, "step": jnp.asarray(2)}
    mgr.save(3, {"state": state3, "lowest_loss": 0.4}, is_best=True)

    assert mgr.latest_step() == 3
    template = {"state": state, "lowest_loss": 0.0}
    restored = mgr.restore(template=template)
    tree_equal(restored["state"], state3)

    # max_to_keep=2 garbage-collected step 1
    assert mgr.restore(step=2, template=template) is not None
    best = mgr.restore_best(template=template)
    tree_equal(best["state"], state3)
    mgr.close()


def test_manager_restore_empty(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    assert mgr.restore() is None
    assert mgr.restore_best() is None
    mgr.close()


@pytest.mark.slow
def test_load_torch_pth_tar(tmp_path, rng):
    """A reference-format .pth.tar (epoch/state_dict/lowest_loss) loads into
    flax variables that produce identical model output to the exported dict."""
    from gndnet_tpu.checkpoint import export_torch_state_dict

    model, variables = init_model(CFG)
    sd = export_torch_state_dict(variables, CFG)
    ckpt = {
        "epoch": 7,
        "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
        "lowest_loss": 0.123,
        "optimizer": {},
    }
    path = tmp_path / "checkpoint.pth.tar"
    torch.save(ckpt, str(path))

    loaded = load_torch_checkpoint(str(path), CFG)
    assert loaded["epoch"] == 7
    assert loaded["lowest_loss"] == pytest.approx(0.123)
    tree_equal(loaded["variables"]["params"], variables["params"])

    # 'module.' DataParallel prefixes are stripped
    ckpt2 = {"state_dict": {f"module.{k}": v
                            for k, v in ckpt["state_dict"].items()}}
    torch.save(ckpt2, str(tmp_path / "dp.pth.tar"))
    loaded2 = load_torch_checkpoint(str(tmp_path / "dp.pth.tar"), CFG)
    tree_equal(loaded2["variables"]["params"], variables["params"])


def test_train_state_checkpoint_roundtrip(tmp_path):
    """The full TrainState (incl. optimizer pytree) survives save/restore."""
    from gndnet_tpu.train import create_train_state

    model, tx, state = create_train_state(CFG, steps_per_epoch=10)
    mgr = CheckpointManager(str(tmp_path / "train"))
    mgr.save(5, {"state": jax.device_get(state), "epoch": 5,
                 "lowest_loss": 1.0})
    template = {"state": state, "epoch": 0, "lowest_loss": 0.0}
    restored = mgr.restore(template=template)
    assert int(restored["epoch"]) == 5
    tree_equal(restored["state"].params, state.params)
    tree_equal(restored["state"].opt_state, state.opt_state)
    mgr.close()
