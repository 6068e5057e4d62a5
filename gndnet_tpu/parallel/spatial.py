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


def _conv3x3(x, kernel, bias, precision, dtype=jnp.float32):
    # flax nn.Conv(dtype=...) semantics: inputs AND params cast to the
    # compute dtype (bfloat16 on the serving/training fast path)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), window_strides=(1, 1),
        padding=((0, 0), (1, 1)),        # H valid (halo provides context)
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision(precision))
    return y + bias.astype(dtype)


def _bn(x, p, s, train, sync_axes, momentum=0.9, eps=1e-5, n_valid=None):
    """BatchNorm matching flax semantics; training statistics are psum-synced
    over `sync_axes` (sync-BN).  `n_valid` overrides the local element count
    when padded rows were zeroed out of x (they contribute 0 to the sums, so
    only the divisor needs correcting).  Returns (y, new_stats)."""
    x = x.astype(jnp.float32)   # flax BN dtype=float32: stats/affine in f32
    if not train:
        mean, var = s["mean"], s["var"]
        new = s
    else:
        n_local = x.shape[0] * x.shape[1] * x.shape[2]
        sum1 = jnp.sum(x, axis=(0, 1, 2))
        sum2 = jnp.sum(x * x, axis=(0, 1, 2))
        n = jnp.asarray(n_local, x.dtype) if n_valid is None \
            else n_valid.astype(x.dtype)
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


def _cbr(x, p, s, train, sync_axes, axis_name, axis_size, precision,
         mask=None, dtype=jnp.float32):
    """halo -> conv3x3 -> BN -> relu (one ConvBNRelu block, sharded).

    `mask(x)` re-zeroes globally-out-of-range rows; it runs after the conv
    (so BN statistics never see pad-row bias values) and after the relu (so
    the next conv's halo sees the global SAME zero padding)."""
    xh = halo_exchange(x, axis_name, axis_size)
    y = _conv3x3(xh, p["conv"]["kernel"], p["conv"]["bias"], precision,
                 dtype)
    n_valid = None
    if mask is not None:
        y, n_valid = mask(y)
    y, new_s = _bn(y, p["bn"], s["bn"], train, sync_axes, n_valid=n_valid)
    y = jax.nn.relu(y)
    if mask is not None:
        y, _ = mask(y)
    return y, {"bn": new_s}


def segnet_apply_spatial(enc_params, enc_stats, slab, *, train: bool,
                         axis_name: str, axis_size: int,
                         sync_axes=(), precision: str = "highest",
                         global_ny: int | None = None,
                         dtype=jnp.float32):
    """Spatially-sharded SegnetGndEst forward on an (B, Hl, W, C) slab.

    Bit-identical to models.segnet.SegnetGndEst over the full image when
    Hl % 4 == 0 and Hl * axis_size >= global_ny (default: == ny, exact fit).
    When global_ny < Hl * axis_size (e.g. ny=250 padded to 2x128 slabs), the
    trailing pad rows are re-zeroed after every conv so the real rows see
    exactly the global SAME zero padding, pad rows never pollute BN
    statistics, and the pool/unpool floor-drop of odd heights matches the
    unsharded model (pooling windows stay aligned because every slab
    boundary is a multiple of 4).  Returns (pred_slab (B, Hl, W),
    new_enc_stats)."""
    hl0 = slab.shape[1]
    if hl0 % 4 != 0:
        raise ValueError("slab height must be divisible by 4 (two pools)")
    if global_ny is None:
        global_ny = hl0 * axis_size
    if global_ny > hl0 * axis_size:
        raise ValueError(f"global_ny={global_ny} exceeds slab capacity "
                         f"{hl0}x{axis_size}")
    exact = global_ny == hl0 * axis_size
    new_stats = jax.tree_util.tree_map(lambda x: x, enc_stats)  # copy layout
    dev = jax.lax.axis_index(axis_name)

    def make_mask(gh: int, hl: int):
        """Zero rows with global index >= gh; also report the local count of
        valid (B*W*rows) elements for masked BN."""
        if exact:
            return None

        def mask(x):
            g = jnp.arange(x.shape[1]) + dev * hl
            keep = g < gh
            y = jnp.where(keep[None, :, None, None], x,
                          jnp.zeros((), x.dtype))
            n_valid = x.shape[0] * x.shape[2] * jnp.sum(keep)
            return y, n_valid
        return mask

    kw = dict(train=train, sync_axes=sync_axes, axis_name=axis_name,
              axis_size=axis_size, precision=precision, dtype=dtype)

    def stage(x, name, mask):
        p, s = enc_params[name], enc_stats[name]
        x, s1 = _cbr(x, p["conv1"], s["conv1"], mask=mask, **kw)
        x, s2 = _cbr(x, p["conv2"], s["conv2"], mask=mask, **kw)
        new_stats[name] = {"conv1": s1, "conv2": s2}
        return x

    def pre_pool(x, gh: int, mask):
        # the unsharded pool floor-drops the trailing odd row (it is never
        # read); here a pad row could pair with it in a window, so zero the
        # dropped row first — its unpooled position must come back as 0
        if mask is not None and gh % 2 == 1:
            g = jnp.arange(x.shape[1]) + dev * x.shape[1]
            keep = g < (gh - 1)
            x = jnp.where(keep[None, :, None, None], x,
                          jnp.zeros((), x.dtype))
        return x

    gh0 = global_ny
    gh1 = gh0 // 2
    m0 = make_mask(gh0, hl0)
    m1 = make_mask(gh1, hl0 // 2)

    x = stage(slab, "down1", m0)
    hw1 = x.shape[1:3]
    x, idx1 = max_pool_argmax(pre_pool(x, gh0, m0))
    x = stage(x, "down2", m1)
    hw2 = x.shape[1:3]
    x, idx2 = max_pool_argmax(pre_pool(x, gh1, m1))
    x = max_unpool(x, idx2, hw2)
    x = stage(x, "up2", m1)
    x = max_unpool(x, idx1, hw1)
    x = stage(x, "up1", m0)
    xh = halo_exchange(x, axis_name, axis_size)
    pred = _conv3x3(xh, enc_params["regressor"]["kernel"],
                    enc_params["regressor"]["bias"], precision, dtype)
    return pred[..., 0].astype(jnp.float32), new_stats


def _fused_canvas(cfg: GndNetConfig, params, points, train: bool = False):
    """Fused points -> canvas using the PFN linear params directly (the
    shard-local equivalent of GroundEstimatorNet.fused's front half;
    use_norm must be False — asserted by callers).

    Dispatches on cfg.fused_impl exactly like GroundEstimatorNet.fused:
    'affine' runs the flagship sorted/Pallas frontend (ops.pillarize.
    affine_canvas — per-dp-shard local sorts keep the strided cell space
    linear in the local batch; the canvas build is replicated over sp as
    before), so the fast path and the multichip scaling path are the SAME
    code.  `train=True` routes affine through the custom-VJP kernel
    (parameter grads only, matching the single-device train step)."""
    geom = pz.PillarGeometry.from_config(cfg)
    ctx = pz.bin_points_batch(points, geom)
    flat = points.reshape(-1, points.shape[-1])
    lin = params["voxel_feature_extractor"]["pfn_0"]["linear"]
    kernel = lin["kernel"]
    bias = lin.get("bias", jnp.zeros(kernel.shape[1], flat.dtype))
    if cfg.fused_impl == "affine":
        dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                 else jnp.float32)
        return pz.affine_canvas(
            flat, ctx, geom, cfg.max_points_voxel, kernel, bias,
            with_distance=cfg.with_distance,
            exact_point_cap=cfg.exact_point_cap,
            compute_dtype=dtype, precision=cfg.matmul_precision,
            differentiable=train,
            interpret=jax.default_backend() != "tpu")
    decorated, kept, cell_count = pz.fused_frontend(
        flat, ctx, geom, cfg.max_points_voxel,
        with_distance=cfg.with_distance,
        exact_point_cap=cfg.exact_point_cap)
    acts = jax.nn.relu(decorated @ kernel + bias)
    pad_floor = jax.nn.relu(bias.astype(decorated.dtype))
    return pz.canvas_from_activations(
        acts, ctx, kept, cell_count, geom, cfg.max_points_voxel,
        pad_floor=pad_floor)


def slab_height(ny: int, sp: int) -> int:
    """Smallest per-device slab height that is a multiple of 4 (two pool
    stages) covering ny rows over sp devices; hl * sp - ny trailing rows are
    zero padding handled by segnet_apply_spatial's global_ny masking."""
    return -(-ny // (4 * sp)) * 4


def _pad_canvas(canvas: jax.Array, hl: int, sp: int) -> jax.Array:
    pad = hl * sp - canvas.shape[1]
    if pad:
        canvas = jnp.pad(canvas, ((0, 0), (0, pad), (0, 0), (0, 0)))
    return canvas


def make_spmd_train_step(model: GroundEstimatorNet, tx, cfg: GndNetConfig,
                         mesh: Mesh, augment: bool = False) -> Callable:
    """Full dp x sp training step.

    Per device: fused canvas for the local dp batch shard (replicated over
    sp), slab slice, spatially-sharded SegNet, all_gather of the slab
    predictions over sp, loss on the full map.  Gradients: psum over sp
    (each sp device owns its slab's contribution) then pmean over dp.
    Requires use_norm=False; any ny works (odd grids like fine_grid's 250
    get zero-padded slabs with masked rows and masked BN counts).

    `augment=True` matches the single-device step's on-device augmentation
    (train.make_train_step).  The RNG folds (step, dp index) — NOT the sp
    index: points are replicated over sp, and every sp device in a dp row
    must apply the identical transform or their canvases diverge."""
    if cfg.use_norm:
        raise ValueError("spatial training requires use_norm=False")
    sp = mesh.shape["sp"]
    dp = mesh.shape["dp"]
    hl = slab_height(cfg.ny, sp)
    total = loss_fn(cfg)
    dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
             else jnp.float32)

    def local_step(state: TrainState, points, labels):
        if augment:
            from gndnet_tpu.data.augmentation import device_augment

            key = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
            key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
            points, labels = device_augment(points, labels, key, cfg)

        def compute(params):
            canvas = _pad_canvas(
                _fused_canvas(cfg, params, points, train=True), hl, sp)
            y0 = jax.lax.axis_index("sp") * hl
            slab = jax.lax.dynamic_slice_in_dim(canvas, y0, hl, axis=1)
            pred_slab, new_stats = segnet_apply_spatial(
                params["encoder_decoder"],
                state.batch_stats["encoder_decoder"], slab,
                train=True, axis_name="sp", axis_size=sp,
                sync_axes=("dp", "sp"), precision=cfg.matmul_precision,
                global_ny=cfg.ny, dtype=dtype)
            pred = jax.lax.all_gather(pred_slab, "sp", axis=1, tiled=True)
            pred = pred[:, :cfg.ny]
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
    hl = slab_height(cfg.ny, sp)
    precision = precision or cfg.matmul_precision
    dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
             else jnp.float32)

    def local(variables, points):
        params = variables["params"]
        canvas = _pad_canvas(_fused_canvas(cfg, params, points), hl, sp)
        y0 = jax.lax.axis_index("sp") * hl
        slab = jax.lax.dynamic_slice_in_dim(canvas, y0, hl, axis=1)
        pred_slab, _ = segnet_apply_spatial(
            params["encoder_decoder"],
            variables["batch_stats"]["encoder_decoder"], slab,
            train=False, axis_name="sp", axis_size=sp, precision=precision,
            global_ny=cfg.ny, dtype=dtype)
        return jax.lax.all_gather(pred_slab, "sp", axis=1,
                                  tiled=True)[:, :cfg.ny]

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("dp")),
        out_specs=P("dp"),
        check_vma=False)
    return jax.jit(sharded)
