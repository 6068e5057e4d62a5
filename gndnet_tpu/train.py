"""Training: jitted train/eval steps + the epoch orchestration loop.

Replaces reference training.py end-to-end with one crucial structural change:
the reference voxelizes each sample in a host python loop every step
(training.py:131-143) and only then ships tensors to the device; here the
*raw point batch* is shipped and the entire
pillarize -> PFN -> scatter -> SegNet -> loss -> SGD step is one jitted XLA
program (fused path), so pillarization runs on the TPU and the host only
feeds (B, N, F) arrays.

Optimizer parity: torch SGD(momentum=0.9, weight_decay=5e-4) applies the
weight decay to the gradient before the momentum buffer (reference:
training.py:99); the optax chain add_decayed_weights -> trace -> scale(-lr)
reproduces that update order exactly, with the StepLR(15, 0.8) schedule
(training.py:100) folded in per step.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from gndnet_tpu import losses
from gndnet_tpu.checkpoint import CheckpointManager
from gndnet_tpu.config import GndNetConfig
from gndnet_tpu.data.provider import GroundDataset, iterate_batches, prefetch_to_device
from gndnet_tpu.models.gndnet import GroundEstimatorNet, init_model
from gndnet_tpu.ops import pillarize as pz
from gndnet_tpu.utils.logging import AverageMeter, setup_logger
from gndnet_tpu.utils.schedules import step_lr


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # Optional flax DynamicScale for fp16-style loss scaling (the TPU-native
    # replacement for torchplus' fp32-master-copy mixed-precision optimizer,
    # reference: torchplus/train/optim.py:31-110).  bfloat16 training does
    # not need it; kept for capability parity and fp16 export targets.
    dynamic_scale: Any = None


def make_optimizer(cfg: GndNetConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """torch-SGD-equivalent chain with StepLR; see module docstring."""
    schedule = step_lr(cfg.lr, cfg.lr_step_size, cfg.lr_gamma, steps_per_epoch)
    parts = [
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    ]
    if cfg.use_grad_clip:
        # the reference declares `clip` but never applies it (training.py:
        # 164-165 commented out); opt-in here, applied pre-weight-decay like
        # torch clip_grad_norm_ would have been.
        parts.insert(0, optax.clip_by_global_norm(cfg.clip))
    return optax.chain(*parts)


def create_train_state(cfg: GndNetConfig, steps_per_epoch: int,
                       seed: int = 0, loss_scaling: bool = False):
    model, variables = init_model(cfg, seed)
    tx = make_optimizer(cfg, steps_per_epoch)
    ds = None
    if loss_scaling:
        from flax.training import dynamic_scale as dsl

        ds = dsl.DynamicScale()
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        dynamic_scale=ds,
    )
    return model, tx, state


def loss_fn(cfg: GndNetConfig):
    return partial(losses.total_loss, alpha=cfg.alpha, beta=cfg.beta)


def make_train_step(model: GroundEstimatorNet, tx, cfg: GndNetConfig,
                    use_pillar_path: bool = False,
                    augment: bool = False) -> Callable:
    """Build the jitted fused train step: (state, points, labels) -> (state, loss).

    `use_pillar_path=True` routes through the materialized-pillar forward —
    the parity anchor against the PyTorch reference.  use_norm training no
    longer requires it: the fused path derives the padded pillar tensor's
    BatchNorm statistics from the flat stream
    (models/pfn.py:activate_flat_bn_train), pinned equal to this path by
    test_use_norm_fused_train_matches_pillar_path.

    `augment=True` applies on-device augmentation (random rotation + height
    with exact label co-transformation, data/augmentation.device_augment)
    inside the jitted step, keyed on the step counter — augmented end-to-end
    TPU training with zero host round-trips (BASELINE.md driver config #5)."""
    total = loss_fn(cfg)
    geom = pz.PillarGeometry.from_config(cfg)

    def step(state: TrainState, points, labels):
        if augment:
            from gndnet_tpu.data.augmentation import device_augment

            key = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
            points, labels = device_augment(points, labels, key, cfg)

        def compute(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if use_pillar_path:
                pb = pz.pillarize_batch(
                    points, geom, cfg.max_points_voxel, cfg.max_voxels)
                pred, mut = model.apply(
                    variables, pb.voxels, pb.coors, pb.num_points, pb.mask,
                    train=True, mutable=["batch_stats"])
            else:
                pred, mut = model.apply(
                    variables, points, train=True, mutable=["batch_stats"],
                    method=GroundEstimatorNet.fused)
            return total(pred, labels), mut["batch_stats"]

        if state.dynamic_scale is not None:
            # loss-scaled backward: scale the loss, unscale grads, skip the
            # update and halve the scale on non-finite gradients (the
            # reference's nan/inf auto-scale loop, torchplus/train/optim.py).
            ds, is_finite, (loss, new_stats), grads = (
                state.dynamic_scale.value_and_grad(
                    compute, has_aux=True)(state.params))
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(is_finite, n, o), new, old)
            return TrainState(
                step=state.step + 1,
                params=keep(new_params, state.params),
                batch_stats=keep(new_stats, state.batch_stats),
                opt_state=keep(new_opt, state.opt_state),
                dynamic_scale=ds,
            ), loss

        (loss, new_stats), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            dynamic_scale=None,
        ), loss

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model: GroundEstimatorNet, cfg: GndNetConfig,
                   use_pillar_path: bool = False) -> Callable:
    total = loss_fn(cfg)
    geom = pz.PillarGeometry.from_config(cfg)

    def step(state: TrainState, points, labels):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if use_pillar_path:
            pb = pz.pillarize_batch(
                points, geom, cfg.max_points_voxel, cfg.max_voxels)
            pred = model.apply(
                variables, pb.voxels, pb.coors, pb.num_points, pb.mask,
                train=False)
        else:
            pred = model.apply(
                variables, points, train=False,
                method=GroundEstimatorNet.fused)
        return total(pred, labels)

    return jax.jit(step)


def _run_validation(valid_ds, cfg, eval_step, state, seed, epoch,
                    print_freq, logger) -> float:
    """One pass over the validation split; returns the weighted mean loss.

    drop_last=False: validation must see every frame (a 5-frame split with
    batch_size 8 would otherwise vanish entirely).  The ragged final batch
    costs one extra jit specialization, cached across epochs since the
    remainder size is constant."""
    vmeter = AverageMeter()
    vit = prefetch_to_device(iterate_batches(
        valid_ds, cfg.batch_size, shuffle=True, drop_last=False,
        seed=seed + 999, epoch=epoch))
    for i, (points, labels) in enumerate(vit):
        vloss = eval_step(state, points, labels)
        vmeter.update(float(vloss), points.shape[0])
        if i % print_freq == 0:
            logger.debug("Test: [%d/%d]\tLoss %.4f (%.4f)",
                         i, max(len(valid_ds) // cfg.batch_size, 1),
                         vmeter.val, vmeter.avg)
    return vmeter.avg


def train_and_evaluate(cfg: GndNetConfig, workdir: str = ".",
                       epochs: int | None = None,
                       resume: bool = False,
                       save_checkpoints: bool = True,
                       print_freq: int = 100,
                       seed: int = 0,
                       train_skip: int = 6, valid_skip: int = 3,
                       augment: bool = False,
                       dp: int = 1, sp: int = 1,
                       logger=None) -> dict:
    """Full training orchestration (reference training.py main loop:
    train -> validate -> scheduler step -> checkpoint-if-best, :284-305).

    `augment=True` enables on-device augmentation inside the jitted train
    step (data/augmentation.device_augment) — the TPU-native replacement for
    the reference's pre-augmented dataset generation
    (dataset_augmentation.py:49-70).  The augmentation RNG is
    fold_in(PRNGKey(0), state.step): a fresh draw every optimizer step,
    deterministic across resumes since the step counter is checkpointed.
    Validation always runs unaugmented.

    `dp`/`sp` > 1 train over a (dp, sp) jax.sharding.Mesh: batches are
    dp-sharded, the pseudo-image is sp-sharded with halo exchange
    (parallel/spatial.py), gradients and BN statistics sync over the mesh,
    and the TrainState stays mesh-replicated — checkpoints save the sharded
    arrays directly and resume restores onto the mesh
    (checkpoint.abstract_sharded).  This is the in-library replacement for
    the reference's Slurm scale-out (run_model_training_cluster.sh:1-17),
    which launched INDEPENDENT 1-GPU runs.  sp > 1 requires use_norm=False;
    cfg.batch_size must divide by dp.  Validation runs the single-program
    eval step on the replicated state (exact, ragged-batch friendly).

    Returns {'train_loss': [...], 'valid_loss': [...], 'lowest_loss': float}.
    """
    os.makedirs(workdir, exist_ok=True)
    logger = logger or setup_logger(
        "train", os.path.join(workdir, "training.log"))
    epochs = cfg.epochs if epochs is None else epochs

    train_ds = GroundDataset(
        cfg.data_dir, "training", train_skip, cfg.input_features,
        max_memory=cfg.max_memory * 2**20, logger=logger)
    try:
        valid_ds = GroundDataset(
            cfg.data_dir, "validation", valid_skip, cfg.input_features,
            max_memory=cfg.max_memory * 2**20, logger=logger)
    except FileNotFoundError:
        logger.warning("no validation split; validating on training data")
        valid_ds = train_ds

    if len(train_ds) < cfg.batch_size:
        raise ValueError(
            f"training split has {len(train_ds)} frames < batch_size "
            f"{cfg.batch_size} (drop_last would yield zero batches); lower "
            f"batch_size or train_skip")
    steps_per_epoch = max(len(train_ds) // cfg.batch_size, 1)
    # use_norm training runs on the fused path too: the padded pillar
    # tensor's BN statistics are derived analytically from the flat stream
    # (PFNLayer.activate_flat_bn_train; parity vs the pillar path is pinned
    # by test_use_norm_fused_train_matches_pillar_path).
    model, tx, state = create_train_state(cfg, steps_per_epoch, seed)

    mesh = None
    shard = lambda batch: batch
    if dp * sp > 1:
        from gndnet_tpu.parallel.mesh import (
            make_dp_train_step, make_mesh, replicate, shard_batch)
        from gndnet_tpu.parallel.spatial import make_spmd_train_step

        if cfg.batch_size % dp:
            raise ValueError(
                f"batch_size {cfg.batch_size} must divide by dp={dp}")
        mesh = make_mesh(dp=dp, sp=sp)
        logger.info("mesh: dp=%d x sp=%d over %d devices", dp, sp, dp * sp)
        state = replicate(mesh, state)
        if sp > 1:
            train_step = make_spmd_train_step(model, tx, cfg, mesh,
                                              augment=augment)
        else:
            train_step = make_dp_train_step(model, tx, cfg, mesh,
                                            augment=augment)
        shard = lambda batch: shard_batch(mesh, batch)
    else:
        train_step = make_train_step(model, tx, cfg, augment=augment)
    eval_step = make_eval_step(model, cfg)

    mgr = CheckpointManager(os.path.join(workdir, "checkpoints")) \
        if save_checkpoints else None
    start_epoch = 0
    lowest_loss = float("inf")
    if resume:
        # restore must not depend on whether THIS run saves (the
        # evaluate-only path resumes with save_checkpoints=False)
        rmgr = mgr if mgr is not None else CheckpointManager(
            os.path.join(workdir, "checkpoints"))
        if rmgr.latest_step() is not None:
            if mesh is not None:
                from gndnet_tpu.checkpoint import abstract_sharded

                # restore straight onto the mesh (re-sharding from any
                # saved layout); scalars stay concrete
                template = {"state": abstract_sharded(state, mesh),
                            "epoch": 0, "lowest_loss": 0.0}
            else:
                template = {"state": state, "epoch": 0, "lowest_loss": 0.0}
            restored = rmgr.restore(template=template)
            state = restored["state"]
            start_epoch = int(restored["epoch"])
            lowest_loss = float(restored["lowest_loss"])
            logger.info("resumed from epoch %d (lowest %.6f)",
                        start_epoch, lowest_loss)

    history = {"train_loss": [], "valid_loss": []}
    for epoch in range(start_epoch, epochs):
        # --- train ---
        batch_time, data_time, meter = AverageMeter(), AverageMeter(), AverageMeter()
        start = time.time()
        it = prefetch_to_device(iterate_batches(
            train_ds, cfg.batch_size, shuffle=True, drop_last=True,
            seed=seed, epoch=epoch))
        for i, (points, labels) in enumerate(it):
            data_time.update(time.time() - start)
            state, loss = train_step(state, *shard((points, labels)))
            meter.update(float(loss), points.shape[0])
            batch_time.update(time.time() - start)
            start = time.time()
            if i % print_freq == 0:
                logger.debug(
                    "Epoch: [%d][%d/%d]\tTime %.3f (%.3f)\tData %.3f (%.3f)\t"
                    "Loss %.6f (%.6f)", epoch, i, steps_per_epoch,
                    batch_time.val, batch_time.avg, data_time.val,
                    data_time.avg, meter.val, meter.avg)
        history["train_loss"].append(meter.avg)

        vavg = _run_validation(valid_ds, cfg, eval_step, state, seed,
                               epoch, print_freq, logger)
        history["valid_loss"].append(vavg)
        logger.info("epoch %d: train %.6f valid %.6f",
                    epoch, meter.avg, vavg)

        is_best = vavg < lowest_loss
        lowest_loss = min(vavg, lowest_loss)
        if mgr is not None:
            # mesh runs save the live sharded/replicated arrays directly
            # (orbax writes shard-by-shard, no host gather); single-device
            # runs keep the host-gathered layout
            saved = state if mesh is not None else jax.device_get(state)
            mgr.save(
                epoch + 1,
                {"state": saved, "epoch": epoch + 1,
                 "lowest_loss": lowest_loss},
                is_best=is_best)

    if not history["valid_loss"]:
        # evaluate-only (epochs == 0) or fully-resumed run: one validation
        # pass on the restored/initial parameters (reference training.py's
        # --evaluate path)
        vavg = _run_validation(valid_ds, cfg, eval_step, state, seed,
                               start_epoch, print_freq, logger)
        history["valid_loss"].append(vavg)
        lowest_loss = min(lowest_loss, vavg)
        logger.info("validation: %.6f", vavg)

    history["lowest_loss"] = lowest_loss
    history["state"] = state
    return history
