"""Localize the f32 canvas diff: TPU-pallas vs CPU-XLA on the fixture scan.

Reports the spatial/channel structure of |diff| > tol cells to tell a
kernel bug (random wide diffs) from a semantics mismatch (e.g. the
padding-row relu(bias) floor toggling on a count disagreement: whole-cell
diffs at specific cells).
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "axon,cpu")
    import jax.numpy as jnp

    from gndnet_tpu.config import kitti_sem_config
    from gndnet_tpu.models.gndnet import init_model
    from gndnet_tpu.ops import pillarize as pz

    print("backend:", jax.default_backend(), flush=True)
    cfg = kitti_sem_config()
    _, variables = init_model(cfg)
    geom = pz.PillarGeometry.from_config(cfg)
    mk = variables["params"]["voxel_feature_extractor"]["pfn_0"][
        "linear"]["kernel"]
    mb = variables["params"]["voxel_feature_extractor"]["pfn_0"][
        "linear"]["bias"]

    scan = np.load(
        "/root/reference/data/training/seq_000/reduced_velo/000000.npy"
    ).astype(np.float32)[:, :4]
    scan[:, 2] += cfg.lidar_height
    pad = np.full((102400 - scan.shape[0], 4), 1e9, np.float32)
    pts_np = np.concatenate([scan, pad])

    def canvas(use_pallas, backend):
        def fn(p):
            ctx = pz.bin_points_batch(p[None], geom)
            return pz.affine_canvas(
                p, ctx, geom, cfg.max_points_voxel, mk, mb,
                exact_point_cap=True, compute_dtype=jnp.float32,
                precision="highest", use_pallas=use_pallas)
        return np.asarray(jax.jit(fn, backend=backend)(pts_np),
                          np.float32)

    c_tpu = canvas(True, "tpu")[0]      # (ny, nx, C)
    c_cpu = canvas(False, "cpu")[0]
    d = np.abs(c_tpu - c_cpu)
    print("max diff", d.max(), "ncells>1e-3:",
          int((d.max(-1) > 1e-3).sum()), "/", d.shape[0] * d.shape[1])
    ys, xs = np.nonzero(d.max(-1) > 1e-3)
    pad_floor = np.maximum(np.asarray(mb, np.float32), 0.0)
    for y, x in list(zip(ys, xs))[:8]:
        ch = np.nonzero(d[y, x] > 1e-3)[0]
        print(f"cell ({y},{x}): {len(ch)} ch diff; "
              f"tpu[0..4]={c_tpu[y, x, ch[:4]]}, "
              f"cpu[0..4]={c_cpu[y, x, ch[:4]]}, "
              f"floor[0..4]={pad_floor[ch[:4]]}")
    # occupancy disagreement: exactly-zero rows differ?
    occ_t = (c_tpu != 0).any(-1)
    occ_c = (c_cpu != 0).any(-1)
    print("occupancy disagreements:", int((occ_t != occ_c).sum()))


if __name__ == "__main__":
    main()
