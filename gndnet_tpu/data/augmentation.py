"""Point-cloud augmentation: host (numpy) and on-device (jax) pipelines.

Re-derivation of the reference's DataAugmentation
(reference: dataset_utils/gnd_data_generator/dataset_augmentation.py:8-240):

* batched random rotation with independent limits for front slope (about y),
  side tilt, and yaw — euler 'zyx' degrees, matching scipy Rotation
  (dataset_augmentation.py:141-154);
* random height shift (:156-158);
* ground-truth co-transformation: the elevation grid is rotated by
  transforming each cell-centre coordinate (:192-218); the reference's
  `augmentHeightWithGroundTruth` references an undefined `labels` variable
  (:220-223) — implemented correctly here;
* triangular-profile noise injection labelled class 260 above/below the
  ground plane (:72-139);
* camera-FOV frustum culling (frustrum_culling.py via ops.postproc).

`device_augment` is the TPU-native addition: rotation/height/label
co-transform as pure jax ops inside the jitted train step (fixed shapes, no
host round-trip), enabling augmented end-to-end TPU training
(BASELINE.md driver config #5).
"""

from __future__ import annotations

import numpy as np

from gndnet_tpu.config import AugmentationConfig, GndNetConfig

NOISE_CLASS = 260  # reference labels injected noise as 260


# ---------------------------------------------------------------------------
# host pipeline (data generation)
# ---------------------------------------------------------------------------

class AugmentationPipeline:
    def __init__(self, cfg: AugmentationConfig, grid_range, voxel_size,
                 rng: np.random.Generator | None = None):
        self.cfg = cfg
        self.grid_range = np.asarray(grid_range, np.float64)
        self.cell = float(voxel_size[0]) if np.ndim(voxel_size) else float(voxel_size)
        self.rng = rng or np.random.default_rng()

    # -- rotations -----------------------------------------------------------

    def _random_rotations(self, n):
        from scipy.spatial.transform import Rotation as R

        theta = np.array([self.cfg.max_rotation, self.cfg.max_side_tilt,
                          self.cfg.max_front_slope])
        angles = theta * (2 * self.rng.random((n, 3)) - 1)
        return R.from_euler("zyx", angles, degrees=True).as_matrix()

    def augment_rotation(self, data: np.ndarray) -> np.ndarray:
        """data: (B, N, >=3); rotates xyz in place and returns data."""
        rots = self._random_rotations(data.shape[0])
        data[:, :, :3] = np.einsum("bnk,bjk->bnj", data[:, :, :3], rots)
        return data

    def augment_rotation_with_gt(self, data: np.ndarray, labels: np.ndarray):
        """Co-rotate clouds and their (H, W) elevation grids.

        Grid rotation = transform each cell-centre (x, y, label_z) by R and
        keep the z column (reference dataset_augmentation.py:202-218; note
        the reference uses cell corners via `indices * scale + offset` — we
        match that exactly)."""
        rots = self._random_rotations(data.shape[0])
        data[:, :, :3] = np.einsum("bnk,bjk->bnj", data[:, :, :3], rots)

        shape = np.asarray(labels[0].shape)
        offset = self.grid_range[0:2]
        scale = (self.grid_range[2:4] - self.grid_range[0:2]) / shape
        idx = np.indices(labels[0].shape).T.reshape(-1, 2)
        coords = idx * scale + offset                      # (H*W, 2)
        for i in range(data.shape[0]):
            g = np.concatenate(
                [coords, labels[i].reshape(1, -1).T], axis=1)  # (H*W, 3)
            labels[i] = (g @ rots[i].T)[:, 2].reshape(labels[i].shape)
        return data, labels

    # -- height --------------------------------------------------------------

    def augment_height(self, data: np.ndarray,
                       labels: np.ndarray | None = None):
        dz = self.cfg.max_height * (2 * self.rng.random(data.shape[0]) - 1)
        data[:, :, 2] += dz[:, None]
        if labels is not None:
            labels += dz[:, None, None]
        return data, labels

    # -- batch expansion (reference getAugmentedData semantics) ---------------

    def augment_batch(self, data: np.ndarray,
                      labels: np.ndarray | None = None):
        """Expand a (B, N, F) batch by num_rotations / num_height_var /
        keep_original (reference dataset_augmentation.py:49-70, 160-190)."""
        cfg = self.cfg
        out = data if not cfg.keep_original else np.copy(data)
        lab = labels if (labels is None or not cfg.keep_original) \
            else np.copy(labels)
        if cfg.num_rotations > 0:
            if cfg.num_rotations > 1:
                out = np.repeat(out, cfg.num_rotations, axis=0)
                if lab is not None:
                    lab = np.repeat(lab, cfg.num_rotations, axis=0)
            if lab is None:
                out = self.augment_rotation(out)
            else:
                out, lab = self.augment_rotation_with_gt(out, lab)
        if cfg.num_height_var > 0:
            if cfg.num_height_var > 1:
                out = np.repeat(out, cfg.num_height_var, axis=0)
                if lab is not None:
                    lab = np.repeat(lab, cfg.num_height_var, axis=0)
            out, lab = self.augment_height(out, lab)
        if cfg.keep_original:
            out = np.concatenate([data, out])
            if lab is not None:
                lab = np.concatenate([labels, lab])
        return (out, lab) if labels is not None else out

    # -- noise injection -------------------------------------------------------

    def add_noise(self, data: np.ndarray, gnd_plane: np.ndarray) -> np.ndarray:
        """Inject triangular-profile noise points labelled NOISE_CLASS.

        data: (N, >=4) single cloud with label column 3; gnd_plane: (H, W)
        elevation grid over grid_range.  The noise count scales with a random
        density over the triangular side-profile volume, points are placed
        above (+) / below (-) the ground plane with distance-growing spread
        (reference _addNoise, dataset_augmentation.py:75-139)."""
        cfg = self.cfg
        rng = self.rng
        lo = np.maximum(data[:, :2].min(axis=0), self.grid_range[:2])
        hi = np.minimum(data[:, :2].max(axis=0), self.grid_range[2:4])

        min_distance = rng.random() * (
            cfg.noise_min_distance[1] - cfg.noise_min_distance[0]
        ) + cfg.noise_min_distance[0]
        x0 = max(lo[0], min_distance)
        x1 = hi[0]
        if x0 >= x1:
            return data

        chunks = [data]
        for side, (coeffs, densities) in enumerate(
            [(cfg.noise_coefficient_top, cfg.noise_density_top),
             (cfg.noise_coefficient_bottom, cfg.noise_density_bottom)]
        ):
            if coeffs[0] == 0 and coeffs[1] == 0:
                continue
            coeff = rng.random() * (coeffs[1] - coeffs[0]) + coeffs[0]
            dens = rng.random() * (densities[1] - densities[0]) + densities[0]
            area = 0.5 * (x1 - x0) * x1 * coeff
            count = int(area * (hi[1] - lo[1]) * dens * 0.01)
            if count <= 0:
                continue
            pts = np.zeros((count, data.shape[1]), data.dtype)
            pts[:, 0] = rng.random(count) * (x1 - x0) + x0
            pts[:, 1] = rng.random(count) * (hi[1] - lo[1]) + lo[1]
            gi = np.clip(
                ((pts[:, :2] - self.grid_range[:2]) / self.cell).astype(int),
                0, np.asarray(gnd_plane.shape) - 1)
            spread = np.abs(rng.normal(
                0.0, (pts[:, 0] - x0 + 1e-6) * coeff))
            sign = 1.0 if side == 0 else -1.0
            pts[:, 2] = gnd_plane[gi[:, 0], gi[:, 1]] + sign * spread
            if data.shape[1] > 3:
                pts[:, 3] = NOISE_CLASS
            chunks.append(pts)
        return np.concatenate(chunks)

    # -- FOV -------------------------------------------------------------------

    def camera_fov(self, data: np.ndarray, fov=115.0, aspect_ratio=16 / 9,
                   near=0.1, far=10.0) -> np.ndarray:
        """Frustum-cull to a forward camera's field of view
        (reference getCameraFOV, dataset_augmentation.py:225-240)."""
        import jax.numpy as jnp

        from gndnet_tpu.ops.postproc import filter_points_by_frustum

        mask = np.asarray(filter_points_by_frustum(
            jnp.asarray(data[:, :3].astype(np.float32)),
            np.zeros(3, np.float32), np.array([1.0, 0, 0], np.float32),
            fov, aspect_ratio, near, far))
        return data[mask]


# ---------------------------------------------------------------------------
# on-device pipeline (train-time, inside jit)
# ---------------------------------------------------------------------------

def _euler_zyx_matrices(key, n, max_yaw, max_tilt, max_slope):
    """Random rotation matrices for euler 'zyx' (yaw, tilt, slope) degrees,
    matching scipy's R.from_euler('zyx', ...) composition R = Rz @ Ry @ Rx."""
    import jax
    import jax.numpy as jnp

    lim = jnp.asarray([max_yaw, max_tilt, max_slope]) * (jnp.pi / 180.0)
    ang = jax.random.uniform(key, (n, 3), minval=-1.0, maxval=1.0) * lim
    cz, sz = jnp.cos(ang[:, 0]), jnp.sin(ang[:, 0])
    cy, sy = jnp.cos(ang[:, 1]), jnp.sin(ang[:, 1])
    cx, sx = jnp.cos(ang[:, 2]), jnp.sin(ang[:, 2])
    zero = jnp.zeros_like(cz)
    one = jnp.ones_like(cz)
    rz = jnp.stack([cz, -sz, zero, sz, cz, zero, zero, zero, one],
                   -1).reshape(n, 3, 3)
    ry = jnp.stack([cy, zero, sy, zero, one, zero, -sy, zero, cy],
                   -1).reshape(n, 3, 3)
    rx = jnp.stack([one, zero, zero, zero, cx, -sx, zero, sx, cx],
                   -1).reshape(n, 3, 3)
    return rz @ ry @ rx


def device_augment(points, labels, key, cfg: GndNetConfig):
    """Jit-friendly augmentation: per-sample random rotation + height shift
    with exact ground-truth co-transformation.

    points: (B, N, F); labels: (B, H, W).  Returns (points', labels').
    The label grid transform matches the host pipeline: cell coordinates
    (idx * scale + offset, z) are rotated and the z column re-gridded.
    """
    import jax
    import jax.numpy as jnp

    a = cfg.augmentation
    b = points.shape[0]
    k_rot, k_h = jax.random.split(key)
    rots = _euler_zyx_matrices(k_rot, b, a.max_rotation, a.max_side_tilt,
                               a.max_front_slope)
    xyz = jnp.einsum("bnk,bjk->bnj", points[..., :3], rots)
    points = jnp.concatenate([xyz, points[..., 3:]], axis=-1)

    h, w = labels.shape[1:]
    gr = jnp.asarray(cfg.grid_range)
    # labels are stored [y_cell, x_cell] (the generator saves the transposed
    # [x, y] heightmap, reference semKitti_morph_data_camera.py:287-310), so
    # cell (iy, ix) sits at world (x = xmin + ix*sx, y = ymin + iy*sy); the
    # rotation must see (x, y, z) column order.
    sx = (gr[2] - gr[0]) / w
    sy = (gr[3] - gr[1]) / h
    iy, ix = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    coords = jnp.stack(
        [gr[0] + ix.reshape(-1) * sx, gr[1] + iy.reshape(-1) * sy], -1)
    g = jnp.concatenate(
        [jnp.broadcast_to(coords, (b,) + coords.shape),
         labels.reshape(b, -1, 1)], axis=-1)
    labels = jnp.einsum("bnk,bjk->bnj", g, rots)[..., 2].reshape(b, h, w)

    dz = jax.random.uniform(k_h, (b,), minval=-1.0, maxval=1.0) * a.max_height
    points = points.at[..., 2].add(dz[:, None])
    labels = labels + dz[:, None, None]
    return points, labels
