"""Bisect the ~683 us gap between affine_canvas and the hand-rolled chain."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def timed(fn, inputs, reps=48, dispatches=5):
    import jax
    import jax.numpy as jnp

    def chained(args):
        def body(acc, i):
            out = fn(i, *args)
            return acc + jnp.sum(
                jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x.astype(jnp.float32)),
                    out, jnp.float32(0))), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(reps, dtype=jnp.int32))
        return acc

    g = jax.jit(chained)
    float(g(inputs))
    best = float("inf")
    for _ in range(dispatches):
        t0 = time.perf_counter()
        float(g(inputs))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    import jax
    import jax.numpy as jnp

    from gndnet_tpu.config import kitti_sem_config
    from gndnet_tpu.models.gndnet import init_model
    from gndnet_tpu.ops import pillarize as pz
    from gndnet_tpu.ops.pallas_affine import (affine_scan_t, histogram_ends,
                                              _make_scan_gather)

    print("backend:", jax.default_backend(), flush=True)
    cfg = kitti_sem_config().replace(
        compute_dtype="bfloat16", matmul_precision="default",
        fused_impl="affine")
    _, variables = init_model(cfg)
    geom = pz.PillarGeometry.from_config(cfg)

    scan = np.load(
        "/root/reference/data/training/seq_000/reduced_velo/000000.npy"
    ).astype(np.float32)[:, :4]
    n_eng = 102400
    pad = np.full((n_eng - scan.shape[0], 4), 1e9, np.float32)
    pts_eng = jnp.asarray(np.concatenate([scan, pad]))

    def bump(i, p):
        return p + (i.astype(jnp.float32) * 1e-6) * jnp.asarray(
            [0, 0, 1, 0], jnp.float32)

    mk = variables["params"]["voxel_feature_extractor"]["pfn_0"][
        "linear"]["kernel"]
    mb = variables["params"]["voxel_feature_extractor"]["pfn_0"][
        "linear"]["bias"]

    def canvas_copy(i, p, *, use_vjp_wrapper, do_epilogue, stream_order):
        """Inline copy of affine_canvas's pallas branch with switches."""
        points = bump(i, p)
        ctx = pz.bin_points_batch(points[None], geom)
        max_points = cfg.max_points_voxel
        compute_dtype = jnp.bfloat16
        ftype = points.dtype
        mmat, w_clu, w_cen, bias = pz.affine_pfn_weights(mk, mb, 4, geom)
        b = 1
        n_per = points.shape[0]
        c3 = geom.num_cells_3d
        f = 4
        local = jnp.where(ctx.valid, ctx.cell, c3)
        idxcap = 1 << max(n_per - 1, 1).bit_length()
        pts2d = points.reshape(b, n_per, f)
        local2d = local.reshape(b, n_per)
        key = local2d * idxcap + jnp.arange(n_per, dtype=jnp.int32)
        skey = jax.lax.sort(key, dimension=-1)
        local_s2 = skey // idxcap
        idx_s = skey - local_s2 * idxcap
        spts2d = jnp.take_along_axis(pts2d, idx_s[..., None], axis=1)
        chunk = 2048
        n_pad = n_per
        cell_s = local_s2.reshape(b * n_pad)
        spts = spts2d.reshape(b * n_pad, f)
        local_s = local_s2
        valid = (local_s < c3).reshape(-1)

        m_flat = b * n_pad
        sptst = spts.T
        parts = [sptst[:3], valid.astype(ftype)[None, :], sptst[3:f],
                 jnp.zeros((8 - f - 1, m_flat), ftype)]
        pts8t = jnp.concatenate(parts, axis=0)
        mmat8t = jnp.zeros((mmat.shape[1], 8), mmat.dtype)
        mmat8t = mmat8t.at[:, 0:3].set(mmat[0:3].T)
        mmat8t = mmat8t.at[:, 4:4 + f - 3].set(mmat[3:f].T)

        ends_local, counts_raw = histogram_ends(local_s, geom.ny, geom.nx)
        starts_local = ends_local - counts_raw + 1
        ends_local = jnp.maximum(
            starts_local + jnp.minimum(counts_raw, max_points) - 1, 0)
        ends = ends_local.reshape(-1)
        counts_flat = counts_raw.reshape(-1)
        starts = jnp.where(counts_flat > 0, starts_local.reshape(-1),
                           b * n_pad)
        if use_vjp_wrapper:
            scan_gather = _make_scan_gather(max_points, "bfloat16", chunk,
                                            False)
            tot, smax = scan_gather(cell_s, ends, starts, pts8t, mmat8t)
        else:
            tot_t, max_t = affine_scan_t(
                cell_s, pts8t, mmat8t, max_points=max_points,
                out_dtype=compute_dtype, chunk=chunk)
            tot, smax = tot_t.T[ends], max_t.T[ends]
        if not do_epilogue:
            return tot, smax
        count = jnp.where(counts_flat > 0, tot[:, 3], 0.0)
        mean = tot[:, :3] / jnp.maximum(count, 1.0)[:, None]
        ncells = ctx.num_segments - 1
        nx = geom.nx
        cell_ids = jnp.arange(ncells, dtype=jnp.int32) % geom.num_cells_2d
        ccx = (cell_ids % nx).astype(ftype)
        ccy = (cell_ids // nx).astype(ftype)
        vx, vy = geom.voxel_size[0], geom.voxel_size[1]
        centers = jnp.stack(
            [ccx * vx + (vx / 2.0 + geom.pc_range[0]),
             ccy * vy + (vy / 2.0 + geom.pc_range[1])], axis=-1)
        w_cell = (bias.astype(compute_dtype)
                  - mean.astype(compute_dtype) @ w_clu.astype(compute_dtype)
                  - centers.astype(compute_dtype) @ w_cen.astype(
                      compute_dtype))
        canvas = jax.nn.relu(smax + w_cell)
        pad_floor = jax.nn.relu(bias.astype(compute_dtype))
        occupied = count > 0
        has_padding_row = occupied & (count < max_points)
        canvas = jnp.where(has_padding_row[:, None],
                           jnp.maximum(canvas, pad_floor[None, :]), canvas)
        canvas = jnp.where(occupied[:, None], canvas, 0)
        return canvas.reshape(ctx.batch, geom.ny, geom.nx, -1)

    import functools

    def real_canvas(i, p):
        points = bump(i, p)
        ctx = pz.bin_points_batch(points[None], geom)
        return pz.affine_canvas(points, ctx, geom, cfg.max_points_voxel,
                                mk, mb, compute_dtype=jnp.bfloat16,
                                precision="default")

    cases = [
        ("copy_novjp_noepi", functools.partial(
            canvas_copy, use_vjp_wrapper=False, do_epilogue=False,
            stream_order=True)),
        ("copy_vjp_noepi", functools.partial(
            canvas_copy, use_vjp_wrapper=True, do_epilogue=False,
            stream_order=True)),
        ("copy_novjp_epi", functools.partial(
            canvas_copy, use_vjp_wrapper=False, do_epilogue=True,
            stream_order=True)),
        ("copy_vjp_epi", functools.partial(
            canvas_copy, use_vjp_wrapper=True, do_epilogue=True,
            stream_order=True)),
        ("real_affine_canvas", real_canvas),
    ]
    for name, fn in cases:
        dt = timed(fn, (pts_eng,)) * 1e6
        print(f"{name:22s} {dt:9.1f} us", flush=True)


if __name__ == "__main__":
    main()
