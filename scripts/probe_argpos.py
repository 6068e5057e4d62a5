"""Full-scale argpos divergence probe: TPU-compiled affine_scan_t
(want_argmax) vs CPU interpret on the fixture's sorted stream.

The d(kernel) residual (~4.7e-2 rel) between the TPU VJP and CPU autodiff
survives deduplication, so it is not duplicate-tie flips.  This probe
reproduces affine_canvas's b=1 sorted stream, runs the argmax-tracking
scan on both backends, and for every gathered end-row argpos mismatch
prints the CPU-computed activation margin between the two candidate rows —
near-zero margins mean backend-rounding tie flips; large margins mean a
compiled-kernel bug at full scale.
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
    from gndnet_tpu.ops.pallas_affine import affine_scan_t, histogram_ends

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
    pts_np = np.concatenate(
        [scan, np.full((102400 - scan.shape[0], 4), 1e9, np.float32)])

    # reproduce affine_canvas's b=1 stream prep on CPU (numpy/jax-cpu)
    mmat = pz.affine_pfn_weights(mk, mb, 4, geom, False)[0]
    mmat = np.asarray(mmat)
    c3 = geom.num_cells_3d
    lo = np.asarray(geom.pc_range[:3], np.float32)
    v = np.asarray(geom.voxel_size, np.float32)
    c = np.floor((pts_np[:, :3] - lo) / v)
    ok = ((c >= 0) & (c < np.asarray(geom.grid_size, np.float32))).all(1)
    ci = c.astype(np.int64)
    cell = ci[:, 1] * geom.nx + ci[:, 0]
    local = np.where(ok, cell, c3).astype(np.int32)
    n = len(local)
    idxcap = 1 << max(n - 1, 1).bit_length()
    key = local.astype(np.int64) * idxcap + np.arange(n)
    order = np.argsort(key, kind="stable")
    local_s = local[order]
    spts = pts_np[order]
    chunk = 2048
    pad = (-n) % chunk
    if pad:
        local_s = np.concatenate([local_s, np.full(pad, c3, np.int32)])
        spts = np.concatenate([spts, np.zeros((pad, 4), np.float32)])
    valid = (local_s < c3).astype(np.float32)

    cell_j = jnp.asarray(local_s)
    pts_t = jnp.asarray(spts.T)
    valid_j = jnp.asarray(valid)[None]
    mmat_t = jnp.asarray(mmat.T)
    kw = dict(max_points=cfg.max_points_voxel, out_dtype=jnp.float32,
              chunk=chunk, transpose_out=True, want_argmax=True,
              precision="highest")

    ref = affine_scan_t(cell_j, pts_t, valid_j, mmat_t, interpret=True,
                        **kw)
    got = jax.jit(lambda cc, p, vv, m: affine_scan_t(cc, p, vv, m, **kw),
                  backend="tpu")(cell_j, pts_t, valid_j, mmat_t)

    ends_l, counts = histogram_ends(jnp.asarray(local_s)[None],
                                    geom.ny, geom.nx)
    starts = ends_l - counts + 1
    ends = np.asarray(jnp.maximum(
        starts + jnp.minimum(counts, cfg.max_points_voxel) - 1, 0))[0]
    occ = np.asarray(counts)[0] > 0

    v_ref = np.asarray(ref[1], np.float32)[ends][occ]
    v_got = np.asarray(got[1], np.float32)[ends][occ]
    p_ref = np.asarray(ref[2])[ends][occ]
    p_got = np.asarray(got[2])[ends][occ]
    print("end-row value max|diff|:", np.abs(v_ref - v_got).max())
    mm = p_ref != p_got
    print("end-row argpos mismatches:", int(mm.sum()), "/", mm.size,
          f"({mm.size} = occupied cells x 64ch)")

    # margins at mismatches, computed on CPU at f64 for honesty
    a64 = spts.astype(np.float64) @ mmat.astype(np.float64)
    ii, cc_ = np.nonzero(mm)
    a1 = a64[p_ref[mm], cc_]
    a2 = a64[p_got[mm], cc_]
    rel = np.abs(a1 - a2) / np.maximum(np.abs(a1), 1e-9)
    print("margin rel: max", rel.max() if len(rel) else 0.0,
          " median", np.median(rel) if len(rel) else 0.0)
    # are the disagreeing rows the same point duplicated?
    same_pt = (spts[p_ref[mm]] == spts[p_got[mm]]).all(1)
    print("mismatches where rows are identical points:",
          int(same_pt.sum()), "/", int(mm.sum()))


if __name__ == "__main__":
    main()
