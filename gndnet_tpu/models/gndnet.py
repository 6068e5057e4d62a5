"""GroundEstimatorNet: the full scan -> elevation-map model.

Assembly of PFN -> pseudo-image -> SegNet (reference: model.py:13-42) with
two apply paths sharing one parameter set:

* `__call__(voxels, coors, num_points, mask)` — reference-style: consumes
  materialized pillars (from ops.pillarize.pillarize_batch), decorates,
  runs the PFN stack, scatters to the canvas, runs SegNet.  Supports every
  configuration (multi-layer PFN, use_norm training) and is the parity
  anchor against the PyTorch reference.

* `fused(points)` — the TPU fast path: raw (B, N, F) points in, elevation
  out, with PFN-linear+max+scatter fused into one matmul + segment-max over
  a flat batched segment space (see ops/pillarize.py).  Requires a
  single-layer PFN (the only shipped configuration) and eval-mode batch
  norm; produces bit-identical canvases to the reference-style path.

Output is (B, ny, nx) float32 elevation (the reference squeezes, making B=1
rank-2, model.py:42 — we keep the batch axis; `infer` squeezes at the API
edge).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gndnet_tpu.config import GndNetConfig
from gndnet_tpu.models.pfn import PillarFeatureNet
from gndnet_tpu.models.segnet import SegnetGndEst
from gndnet_tpu.ops import pillarize as pz
from gndnet_tpu.ops.scatter import scatter_pillars_to_canvas


class GroundEstimatorNet(nn.Module):
    cfg: GndNetConfig
    bn_axis: str | None = None   # mesh axis name for sync-BN under shard_map

    def setup(self):
        self.geom = pz.PillarGeometry.from_config(self.cfg)
        self.pfn = PillarFeatureNet(
            num_filters=self.cfg.vfe_filters,
            use_norm=self.cfg.use_norm,
            precision=self.cfg.matmul_precision,
            bn_axis=self.bn_axis,
            name="voxel_feature_extractor",
        )
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        self.encoder_decoder = SegnetGndEst(
            in_channels=self.cfg.vfe_filters[-1],
            dtype=dtype,
            precision=self.cfg.matmul_precision,
            bn_axis=self.bn_axis,
            name="encoder_decoder",
        )

    def __call__(self, voxels, coors, num_points, mask, train: bool = False):
        """Reference-style forward.

        Args:
          voxels: (B, M, P, F) pillar point tensors.
          coors: (B, M, 3) int32 zyx.
          num_points: (B, M) int32.
          mask: (B, M) bool pillar validity.
        Returns (B, ny, nx) float32 elevation.
        """
        cfg = self.cfg
        decorated = pz.decorate_pillars(
            voxels, num_points, coors[..., jnp.array([2, 1])], self.geom,
            cfg.max_points_voxel, with_distance=cfg.with_distance,
        )
        b, m, p, d = decorated.shape
        pillar_feats = self.pfn(decorated.reshape(b * m, p, d), train=train,
                                pillar_mask=mask.reshape(b * m))
        pillar_feats = pillar_feats.reshape(b, m, -1)
        # The reference scatters padding pillars too (they are zero rows at
        # canvas cell 0 before any real pillar writes); we mask them instead.
        pillar_feats = jnp.where(mask[..., None], pillar_feats, 0)
        canvas = scatter_pillars_to_canvas(
            pillar_feats, coors, mask, self.geom.ny, self.geom.nx
        )
        pred = self.encoder_decoder(canvas, train=train)
        return jnp.squeeze(pred, axis=-1)

    def fused(self, points, train: bool = False):
        """Fused fast path: (B, N, F) raw points -> (B, ny, nx) elevation."""
        cfg = self.cfg
        if len(cfg.vfe_filters) != 1:
            raise ValueError("fused path requires a single PFN layer")
        geom = self.geom
        ctx = pz.bin_points_batch(points, geom)
        flat_points = points.reshape(-1, points.shape[-1])
        layer = self.pfn.layers[0]
        if cfg.use_norm and train:
            # Flat-stream batch BN: the padded pillar tensor's statistics
            # are derived from the flat z stream (pad rows are zeros through
            # the bias-free linear; the divisor is the static pillar-tensor
            # row count) — see PFNLayer.activate_flat_bn_train.  Uses the
            # scatter frontend: the affine decomposition's single-affine
            # contract doesn't hold until the batch stats (which depend on
            # the kernel) are computed, so affine/sorted impls route here
            # too for use_norm training.
            decorated, kept, cell_count = pz.fused_frontend(
                flat_points, ctx, geom, cfg.max_points_voxel,
                with_distance=cfg.with_distance,
                exact_point_cap=cfg.exact_point_cap)
            # Reference BatchNorm1d divisor: the DYNAMIC actual-pillar count
            # x max_points (modules/pointpillars.py:55).  Occupied cells per
            # scan, capped at max_voxels (the reference drops pillars past
            # capacity before BN sees them; the fused stream has no voxel
            # cap, so beyond-capacity occupancy is already a documented
            # forward deviation — docs/PARITY.md known #1).
            occ = (cell_count > 0).reshape(points.shape[0], -1)
            n_pillars = jnp.sum(jnp.minimum(
                occ.sum(axis=1), cfg.max_voxels))
            total_rows = n_pillars * cfg.max_points_voxel
            acts, pad_floor = layer.activate_flat_bn_train(
                decorated, total_rows)
            canvas = pz.canvas_from_activations(
                acts, ctx, kept, cell_count, geom, cfg.max_points_voxel,
                pad_floor=pad_floor)
            pred = self.encoder_decoder(canvas, train=train)
            return jnp.squeeze(pred, axis=-1)
        if cfg.fused_impl == "affine":
            # round-2 fast path: sort + segmented scans, no duplicate-index
            # scatter, PFN linear split into per-point matmul + per-cell
            # offset (ops/pillarize.py:affine_canvas)
            kernel, bias = layer.effective_affine()
            dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                     else jnp.float32)
            canvas = pz.affine_canvas(
                flat_points, ctx, geom, cfg.max_points_voxel, kernel, bias,
                with_distance=cfg.with_distance,
                exact_point_cap=cfg.exact_point_cap,
                compute_dtype=dtype, precision=cfg.matmul_precision,
                differentiable=train,
                interpret=jax.default_backend() != "tpu")
            pred = self.encoder_decoder(canvas, train=train)
            return jnp.squeeze(pred, axis=-1)
        use_sorted = cfg.fused_impl == "sorted"
        # pallas kernels run compiled on TPU, interpreted elsewhere (tests)
        interpret = jax.default_backend() != "tpu"
        if use_sorted:
            decorated, kept, sorted_cell, cell_count = pz.fused_frontend_sorted(
                flat_points, ctx, geom, cfg.max_points_voxel,
                with_distance=cfg.with_distance,
                exact_point_cap=cfg.exact_point_cap,
                interpret=interpret,
            )
        else:
            decorated, kept, cell_count = pz.fused_frontend(
                flat_points, ctx, geom, cfg.max_points_voxel,
                with_distance=cfg.with_distance,
                exact_point_cap=cfg.exact_point_cap,
            )
        acts = layer.activate_flat(decorated, train=train)  # (B*N, C)
        # Reference padding-row quirk: rows zeroed pre-linear contribute
        # relu(linear(0)) to each non-full pillar's max (pointpillars.py:58).
        pad_floor = layer.activate_flat(
            jnp.zeros((1, decorated.shape[-1]), decorated.dtype), train=False
        )[0]
        if use_sorted:
            canvas = pz.canvas_from_sorted_activations(
                acts, kept, sorted_cell, cell_count, ctx, geom,
                cfg.max_points_voxel, pad_floor=pad_floor,
                interpret=interpret,
            )
        else:
            canvas = pz.canvas_from_activations(
                acts, ctx, kept, cell_count, geom, cfg.max_points_voxel,
                pad_floor=pad_floor,
            )
        pred = self.encoder_decoder(canvas, train=train)
        return jnp.squeeze(pred, axis=-1)


def init_model(cfg: GndNetConfig, seed: int = 0):
    """Initialize (model, variables) with dummy pillar inputs."""
    model = GroundEstimatorNet(cfg)
    rng = jax.random.PRNGKey(seed)
    b, m, p = 1, 8, cfg.max_points_voxel
    f = cfg.input_features
    variables = model.init(
        rng,
        jnp.zeros((b, m, p, f), jnp.float32),
        jnp.zeros((b, m, 3), jnp.int32),
        jnp.zeros((b, m), jnp.int32),
        jnp.zeros((b, m), bool),
        train=False,
    )
    return model, variables
