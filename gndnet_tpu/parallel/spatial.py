"""Spatial parallelism: the pseudo-image sharded over mesh axis "sp".

The reference has no sequence/context parallelism to mirror (no attention —
SURVEY.md section 2.3); the conv-model analog is sharding the (ny, nx)
pseudo-image height across devices with halo exchange for the 3x3 convs.
Each device holds an ny/sp slab; before every conv it trades one boundary row
with its neighbours over ICI (`ppermute`), making the sharded SAME-conv
bit-identical to the unsharded one.  Pooling/unpooling stay purely local,
which requires ny/sp divisible by 4 (two 2x2 pool stages) — asserted.

The SegNet here is a functional re-expression of models/segnet.py reading the
same flax parameter tree, so spatial execution shares checkpoints with the
single-device model.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from gndnet_tpu.config import GndNetConfig
from gndnet_tpu.models.gndnet import GroundEstimatorNet
from gndnet_tpu.ops import pillarize as pz
from gndnet_tpu.ops.pooling import max_pool_argmax, max_unpool
from gndnet_tpu.train import TrainState, loss_fn


def halo_exchange(x: jax.Array, axis_name: str, axis_size: int,
                  halo: int = 1) -> jax.Array:
    """Extend a (B, Hl, W, C) slab with `halo` rows from each neighbour.

    Edge devices receive zeros (the global SAME-conv zero padding)."""
    if axis_size == 1:
        z = jnp.zeros_like(x[:, :halo])
        return jnp.concatenate([z, x, z], axis=1)
    idx = jax.lax.axis_index(axis_name)
    down = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    up = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    from_prev = jax.lax.ppermute(x[:, -halo:], axis_name, down)
    from_next = jax.lax.ppermute(x[:, :halo], axis_name, up)
    from_prev = jnp.where(idx == 0, 0.0, from_prev)
    from_next = jnp.where(idx == axis_size - 1, 0.0, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=1)


def _conv3x3(x, kernel, bias, precision):
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=((0, 0), (1, 1)),        # H valid (halo provides context)
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision(precision))
    return y + bias


def _bn(x, p, s, train, sync_axes, momentum=0.9, eps=1e-5):
    """BatchNorm matching flax semantics; training statistics are psum-synced
    over `sync_axes` (sync-BN).  Returns (y, new_stats)."""
    if not train:
        mean, var = s["mean"], s["var"]
        new = s
    else:
        n_local = x.shape[0] * x.shape[1] * x.shape[2]
        sum1 = jnp.sum(x, axis=(0, 1, 2))
        sum2 = jnp.sum(x * x, axis=(0, 1, 2))
        n = jnp.asarray(n_local, x.dtype)
        for ax in sync_axes:
            sum1 = jax.lax.psum(sum1, ax)
            sum2 = jax.lax.psum(sum2, ax)
            n = jax.lax.psum(n, ax)
        mean = sum1 / n
        var = sum2 / n - mean * mean
        new = {"mean": momentum * s["mean"] + (1 - momentum) * mean,
               "var": momentum * s["var"] + (1 - momentum) * var}
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y, new


def _cbr(x, p, s, train, sync_axes, axis_name, axis_size, precision):
    """halo -> conv3x3 -> BN -> relu (one ConvBNRelu block, sharded)."""
    xh = halo_exchange(x, axis_name, axis_size)
    y = _conv3x3(xh, p["conv"]["kernel"], p["conv"]["bias"], precision)
    y, new_s = _bn(y, p["bn"], s["bn"], train, sync_axes)
    return jax.nn.relu(y), {"bn": new_s}


def segnet_apply_spatial(enc_params, enc_stats, slab, *, train: bool,
                         axis_name: str, axis_size: int,
                         sync_axes=(), precision: str = "highest"):
    """Spatially-sharded SegnetGndEst forward on an (B, Hl, W, C) slab.

    Functionally identical to models.segnet.SegnetGndEst over the full image
    when Hl * axis_size == ny and Hl % 4 == 0.  Returns
    (pred_slab (B, Hl, W), new_enc_stats)."""
    if slab.shape[1] % 4 != 0:
        raise ValueError("slab height must be divisible by 4 (two pools)")
    new_stats = jax.tree_util.tree_map(lambda x: x, enc_stats)  # copy layout
    kw = dict(train=train, sync_axes=sync_axes, axis_name=axis_name,
              axis_size=axis_size, precision=precision)

    def stage(x, name):
        p, s = enc_params[name], enc_stats[name]
        x, s1 = _cbr(x, p["conv1"], s["conv1"], **kw)
        x, s2 = _cbr(x, p["conv2"], s["conv2"], **kw)
        new_stats[name] = {"conv1": s1, "conv2": s2}
        return x

    x = stage(slab, "down1")
    hw1 = x.shape[1:3]
    x, idx1 = max_pool_argmax(x)
    x = stage(x, "down2")
    hw2 = x.shape[1:3]
    x, idx2 = max_pool_argmax(x)
    x = max_unpool(x, idx2, hw2)
    x = stage(x, "up2")
    x = max_unpool(x, idx1, hw1)
    x = stage(x, "up1")
    xh = halo_exchange(x, axis_name, axis_size)
    pred = _conv3x3(xh, enc_params["regressor"]["kernel"],
                    enc_params["regressor"]["bias"], precision)
    return pred[..., 0].astype(jnp.float32), new_stats


def _fused_canvas(cfg: GndNetConfig, params, points):
    """Fused points -> canvas using the PFN linear params directly (the
    shard-local equivalent of GroundEstimatorNet.fused's front half;
    use_norm must be False — asserted by callers)."""
    geom = pz.PillarGeometry.from_config(cfg)
    ctx = pz.bin_points_batch(points, geom)
    flat = points.reshape(-1, points.shape[-1])
    decorated, kept, cell_count = pz.fused_frontend(
        flat, ctx, geom, cfg.max_points_voxel,
        with_distance=cfg.with_distance,
        exact_point_cap=cfg.exact_point_cap)
    lin = params["voxel_feature_extractor"]["pfn_0"]["linear"]
    acts = jax.nn.relu(
        decorated @ lin["kernel"]
        + lin.get("bias", jnp.zeros(lin["kernel"].shape[1])))
    pad_floor = jax.nn.relu(lin.get(
        "bias", jnp.zeros(lin["kernel"].shape[1], decorated.dtype)))
    return pz.canvas_from_activations(
        acts, ctx, kept, cell_count, geom, cfg.max_points_voxel,
        pad_floor=pad_floor)


def make_spmd_train_step(model: GroundEstimatorNet, tx, cfg: GndNetConfig,
                         mesh: Mesh) -> Callable:
    """Full dp x sp training step.

    Per device: fused canvas for the local dp batch shard (replicated over
    sp), slab slice, spatially-sharded SegNet, all_gather of the slab
    predictions over sp, loss on the full map.  Gradients: psum over sp
    (each sp device owns its slab's contribution) then pmean over dp.
    Requires use_norm=False and ny % (4 * sp) == 0."""
    if cfg.use_norm:
        raise ValueError("spatial training requires use_norm=False")
    sp = mesh.shape["sp"]
    dp = mesh.shape["dp"]
    if cfg.ny % (4 * sp) != 0:
        raise ValueError(f"ny={cfg.ny} must be divisible by 4*sp={4 * sp}")
    hl = cfg.ny // sp
    total = loss_fn(cfg)

    def local_step(state: TrainState, points, labels):
        def compute(params):
            canvas = _fused_canvas(cfg, params, points)
            y0 = jax.lax.axis_index("sp") * hl
            slab = jax.lax.dynamic_slice_in_dim(canvas, y0, hl, axis=1)
            pred_slab, new_stats = segnet_apply_spatial(
                params["encoder_decoder"],
                state.batch_stats["encoder_decoder"], slab,
                train=True, axis_name="sp", axis_size=sp,
                sync_axes=("dp", "sp"), precision=cfg.matmul_precision)
            pred = jax.lax.all_gather(pred_slab, "sp", axis=1, tiled=True)
            return total(pred, labels), new_stats

        (loss, enc_stats), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        # Each sp device computes the full (replicated) loss; the all_gather
        # transpose already routes every device's cotangent back, so the
        # local grad is sp x (its slab contribution): pmean, not psum.
        grads = jax.lax.pmean(grads, "sp")
        grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        new_bs = dict(state.batch_stats)
        new_bs["encoder_decoder"] = enc_stats
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_bs, opt_state=new_opt), loss

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def make_spatial_infer(cfg: GndNetConfig, mesh: Mesh,
                       precision: str | None = None) -> Callable:
    """Eval-mode spatially-sharded inference:
    (variables, points (B, N, F)) -> (B, ny, nx), B sharded over dp."""
    if cfg.use_norm:
        raise ValueError("spatial inference path requires use_norm=False "
                         "(fold BN into the linear first)")
    sp = mesh.shape["sp"]
    if cfg.ny % (4 * sp) != 0:
        raise ValueError(f"ny={cfg.ny} must be divisible by 4*sp={4 * sp}")
    hl = cfg.ny // sp
    precision = precision or cfg.matmul_precision

    def local(variables, points):
        params = variables["params"]
        canvas = _fused_canvas(cfg, params, points)
        y0 = jax.lax.axis_index("sp") * hl
        slab = jax.lax.dynamic_slice_in_dim(canvas, y0, hl, axis=1)
        pred_slab, _ = segnet_apply_spatial(
            params["encoder_decoder"],
            variables["batch_stats"]["encoder_decoder"], slab,
            train=False, axis_name="sp", axis_size=sp, precision=precision)
        return jax.lax.all_gather(pred_slab, "sp", axis=1, tiled=True)

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("dp")),
        out_specs=P("dp"),
        check_vma=False)
    return jax.jit(sharded)
