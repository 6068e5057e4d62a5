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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Sharded checkpoint/resume (VERDICT r4 item 4)
# ---------------------------------------------------------------------------


def _mesh_batch(rng, cfg, b=4, n=256):
    pts = np.zeros((b, n, 3), np.float32)
    pts[..., 0] = rng.uniform(0.2, 15.8, (b, n))
    pts[..., 1] = rng.uniform(-7.8, 7.8, (b, n))
    pts[..., 2] = 0.05 * pts[..., 0] - 0.5 + rng.normal(0, 0.05, (b, n))
    labels = np.zeros((b, cfg.ny, cfg.nx), np.float32)
    labels[:] = (0.05 * (np.arange(cfg.nx) + 0.5) - 0.5)[None, None, :]
    return jnp.asarray(pts), jnp.asarray(labels)


@pytest.mark.slow
def test_sharded_checkpoint_resume_bit_identical(tmp_path, rng):
    """A dp=2 x sp=2 SPMD TrainState saved mid-run restores onto a FRESH
    mesh via an abstract_sharded template and continues bit-identically to
    the uninterrupted run (losses AND final parameters)."""
    from gndnet_tpu.checkpoint import abstract_sharded
    from gndnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from gndnet_tpu.parallel.spatial import make_spmd_train_step
    from gndnet_tpu.train import create_train_state

    pts, labels = _mesh_batch(rng, CFG)
    mesh = make_mesh(dp=2, sp=2)
    model, tx, state0 = create_train_state(CFG, steps_per_epoch=10)
    step = make_spmd_train_step(model, tx, CFG, mesh)
    batch = shard_batch(mesh, (pts, labels))

    # uninterrupted 5-step reference
    ref_state = replicate(mesh, jax.tree_util.tree_map(jnp.copy, state0))
    ref_losses = []
    for _ in range(5):
        ref_state, loss = step(ref_state, *batch)
        ref_losses.append(float(loss))

    # 3 steps -> sharded save (live mesh arrays, no host gather)
    state = replicate(mesh, jax.tree_util.tree_map(jnp.copy, state0))
    for _ in range(3):
        state, _ = step(state, *batch)
    mgr = CheckpointManager(str(tmp_path / "spmd"))
    mgr.save(3, {"state": state, "epoch": 3, "lowest_loss": 1.0})
    mgr.close()
    del state

    # FRESH mesh + manager; abstract template places arrays straight onto it
    mesh2 = make_mesh(dp=2, sp=2)
    _, _, state_t = create_train_state(CFG, steps_per_epoch=10)
    template = {"state": abstract_sharded(replicate(mesh2, state_t), mesh2),
                "epoch": 0, "lowest_loss": 0.0}
    mgr2 = CheckpointManager(str(tmp_path / "spmd"))
    restored = mgr2.restore(template=template)
    mgr2.close()
    assert int(restored["epoch"]) == 3
    state = restored["state"]
    # restored leaves are mesh-committed jax Arrays
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.mesh.shape == {"dp": 2, "sp": 2}

    step2 = make_spmd_train_step(model, tx, CFG, mesh2)
    cont_losses = []
    for _ in range(2):
        state, loss = step2(state, *shard_batch(mesh2, (pts, labels)))
        cont_losses.append(float(loss))
    assert cont_losses == ref_losses[3:], (cont_losses, ref_losses)
    for pa, pb in zip(jax.tree_util.tree_leaves(ref_state.params),
                      jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_sharded_save_reshards_on_restore(tmp_path):
    """An array saved dp-sharded from a dp=4 mesh restores onto a different
    (dp=2 x sp=2) layout with different PartitionSpecs — orbax reassembles
    from shards and GSPMD re-places (the cross-topology resume story)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gndnet_tpu.checkpoint import abstract_sharded
    from gndnet_tpu.parallel.mesh import make_mesh

    mesh4 = make_mesh(dp=4, sp=1)
    x = jnp.arange(64.0).reshape(8, 8)
    xs = jax.device_put(x, NamedSharding(mesh4, P("dp")))
    mgr = CheckpointManager(str(tmp_path / "reshard"))
    mgr.save(1, {"x": xs, "n": 3})
    mgr.close()

    mesh22 = make_mesh(dp=2, sp=2)
    template = {"x": jax.ShapeDtypeStruct(
        (8, 8), jnp.float32,
        sharding=NamedSharding(mesh22, P("sp", "dp"))), "n": 0}
    mgr2 = CheckpointManager(str(tmp_path / "reshard"))
    restored = mgr2.restore(template=template)
    mgr2.close()
    np.testing.assert_array_equal(np.asarray(restored["x"]), np.asarray(x))
    assert restored["x"].sharding.spec == P("sp", "dp")
    assert int(restored["n"]) == 3

    # abstract_sharded: array leaves -> sharded structs, scalars untouched
    t = abstract_sharded({"a": x, "k": 7}, mesh22)
    assert isinstance(t["a"], jax.ShapeDtypeStruct) and t["k"] == 7
