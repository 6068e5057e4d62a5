"""Device mesh + data-parallel training.

The reference has NO distributed training (single `.cuda()` device,
reference: training.py:98; Slurm jobs are independent 1-GPU runs,
run_model_training_cluster.sh:1-17).  The TPU-native replacement
(SURVEY.md section 2.3) is an SPMD mesh:

* axis "dp": batch-sharded data parallelism — each device runs the full
  fused pillarize->PFN->SegNet step on its batch shard; gradients (and
  BatchNorm batch statistics: sync-BN) are averaged with `psum` over ICI.
* axis "sp": spatial parallelism over the pseudo-image height
  (parallel/spatial.py) — the conv-model analog of sequence/context
  parallelism.

Built on `shard_map` so every collective is explicit and guaranteed to ride
the mesh (no accidental global sorts over the fused path's flat segment
space: each device sorts only its local shard).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gndnet_tpu.config import GndNetConfig
from gndnet_tpu.models.gndnet import GroundEstimatorNet
from gndnet_tpu.train import TrainState, loss_fn


def make_mesh(dp: int = 1, sp: int = 1, devices=None) -> Mesh:
    """A (dp, sp) mesh over the given (default: all) devices."""
    devices = devices if devices is not None else jax.devices()
    if dp * sp > len(devices):
        raise ValueError(
            f"mesh {dp}x{sp} needs {dp * sp} devices, have {len(devices)}")
    import numpy as np

    grid = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(grid, axis_names=("dp", "sp"))


def shard_batch(mesh: Mesh, batch):
    """Place (points, labels, ...) arrays batch-sharded over dp."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def make_dp_train_step(model: GroundEstimatorNet, tx, cfg: GndNetConfig,
                       mesh: Mesh, augment: bool = False) -> Callable:
    """Data-parallel fused train step.

    state is replicated; (points, labels) are dp-sharded.  Inside the shard,
    each device runs the ordinary fused forward/backward on its local batch;
    grads and the loss are `pmean`ed over dp, and BatchNorm runs as true
    sync-BN (flax axis_name="dp" psums the batch statistics inside the
    forward), so a dp=K step is bit-comparable to the single-device step on
    the concatenated batch.

    `augment=True` applies the same on-device augmentation as the
    single-device step (train.make_train_step), with the RNG additionally
    folded on the dp axis index so shards draw distinct transforms (the
    RNG STREAM therefore differs from the single-device step — same
    distribution, not bit-equal)."""
    total = loss_fn(cfg)
    sync_model = GroundEstimatorNet(model.cfg, bn_axis="dp")

    def local_step(state: TrainState, points, labels):
        if augment:
            from gndnet_tpu.data.augmentation import device_augment

            key = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
            key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
            points, labels = device_augment(points, labels, key, cfg)

        def compute(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            pred, mut = sync_model.apply(
                variables, points, train=True, mutable=["batch_stats"],
                method=GroundEstimatorNet.fused)
            return total(pred, labels), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt), loss

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_dp_eval_step(model: GroundEstimatorNet, cfg: GndNetConfig,
                      mesh: Mesh) -> Callable:
    total = loss_fn(cfg)

    def local_eval(state: TrainState, points, labels):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        pred = model.apply(variables, points, train=False,
                           method=GroundEstimatorNet.fused)
        return jax.lax.pmean(total(pred, labels), "dp")

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_infer(model: GroundEstimatorNet, cfg: GndNetConfig,
                  mesh: Mesh) -> Callable:
    """Batch-sharded fused inference: (variables, points (B,N,F)) ->
    (B, ny, nx) with B sharded over dp."""
    def local(variables, points):
        return model.apply(variables, points, train=False,
                           method=GroundEstimatorNet.fused)

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(sharded)
