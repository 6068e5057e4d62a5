"""Cumulative decomposition of the TRAIN-shape frontend (B=16, exact cap,
bf16) — the B=16 sibling of probe_decomp.py's B=1 serving table — plus the
per-item packed-sort alternative the B=1 path uses (gated off at B>1 by a
round-2 measurement this probe re-checks at the real train shapes).

Chained-carry methodology (bench.py docstring); every stage's anchor input
is perturbed per-iteration so nothing hoists.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def timed(fn, inputs, reps=8, dispatches=3):
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
    from gndnet_tpu.ops import pillarize as pz

    print("backend:", jax.default_backend(), flush=True)
    cfg = kitti_sem_config().replace(
        compute_dtype="bfloat16", matmul_precision="default",
        fused_impl="affine")
    geom = pz.PillarGeometry.from_config(cfg)

    scan = np.load(
        "/root/reference/data/training/seq_000/reduced_velo/000000.npy"
    ).astype(np.float32)[:, :4]
    b = 16
    pts16 = jnp.asarray(np.broadcast_to(scan[None], (b,) + scan.shape).copy())
    n_per = scan.shape[0]
    f = 4
    c3 = geom.num_cells_3d
    stride = c3 + 1

    rngk = np.random.default_rng(0)
    kernel = jnp.asarray(rngk.normal(size=(9, 64)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rngk.normal(size=(64,)).astype(np.float32) * 0.1)

    def bump(i, p):
        return p + (i.astype(jnp.float32) * 1e-6) * jnp.asarray(
            [0, 0, 1, 0], jnp.float32)

    def local2d_of(p):
        ctx = pz.bin_points_batch(p, geom)
        batch_ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n_per)
        local = jnp.where(ctx.valid, ctx.cell - batch_ids * c3, c3)
        return ctx, local.reshape(b, n_per)

    def s1_bin(i, p):
        _, l2 = local2d_of(bump(i, p))
        return l2

    def s2_sort5(i, p):
        p = bump(i, p)
        _, local2d = local2d_of(p)
        pts2d = p.reshape(b, n_per, f)
        sorted_all = jax.lax.sort(
            (local2d,) + tuple(pts2d[..., k] for k in range(f)),
            num_keys=1, is_stable=True, dimension=-1)
        return sorted_all[0], jnp.stack(sorted_all[1:], axis=-1)

    def s2b_sort_packed(i, p):
        p = bump(i, p)
        _, local2d = local2d_of(p)
        pts2d = p.reshape(b, n_per, f)
        idxcap = 1 << max(n_per - 1, 1).bit_length()
        assert (stride - 1) * idxcap + (n_per - 1) < 2 ** 31
        key = local2d * idxcap + jnp.arange(n_per, dtype=jnp.int32)
        skey = jax.lax.sort(key, dimension=-1)
        local_s2 = skey // idxcap
        idx_s = skey - local_s2 * idxcap
        spts2d = jnp.take_along_axis(pts2d, idx_s[..., None], axis=1)
        return local_s2, spts2d

    def finish(i, p, sortfn):
        """sort output -> kernel -> ends gather (the scan_gather program)."""
        local_s2, spts2d = sortfn(i, p)
        chunk = 4096
        pad = (-n_per) % chunk
        n_pad = n_per + pad
        if pad:
            local_s2 = jnp.pad(local_s2, ((0, 0), (0, pad)),
                               constant_values=c3)
            spts2d = jnp.pad(spts2d, ((0, 0), (0, pad), (0, 0)))
        cell_s = (local_s2
                  + (jnp.arange(b, dtype=jnp.int32) * stride)[:, None]
                  ).reshape(-1)
        spts = spts2d.reshape(b * n_pad, f)
        valid = (local_s2 < c3).reshape(-1)
        mmat, w_clu, w_cen, bias_ = pz.affine_pfn_weights(
            kernel, bias, f, geom, False)
        pts_t = spts.T
        valid_row = valid.astype(jnp.float32)
        from gndnet_tpu.ops.pallas_affine import (_make_scan_gather,
                                                  histogram_ends)
        ends_local, counts_raw = histogram_ends(local_s2, geom.ny, geom.nx)
        starts_local = ends_local - counts_raw + 1
        ends_local = jnp.maximum(
            starts_local + jnp.minimum(counts_raw, 100) - 1, 0)
        offs = (jnp.arange(b, dtype=jnp.int32) * n_pad)[:, None]
        ends = (ends_local + offs).reshape(-1)
        starts = (starts_local + offs).reshape(-1)
        sg = _make_scan_gather(100, "bfloat16", chunk, False, b, c3)
        tot, smax = sg(cell_s, ends, starts, pts_t, valid_row, mmat.T)
        return tot, smax

    def s3_kernel5(i, p):
        return finish(i, p, s2_sort5)

    def s3b_kernel_packed(i, p):
        return finish(i, p, s2b_sort_packed)

    def s4_full(i, p):
        p = bump(i, p)
        ctx = pz.bin_points_batch(p, geom)
        return pz.affine_canvas(
            p.reshape(-1, f), ctx, geom, cfg.max_points_voxel, kernel, bias,
            exact_point_cap=True, compute_dtype=jnp.bfloat16,
            precision="default", differentiable=False)

    def s5_full_diff(i, p):
        p = bump(i, p)
        ctx = pz.bin_points_batch(p, geom)
        return pz.affine_canvas(
            p.reshape(-1, f), ctx, geom, cfg.max_points_voxel, kernel, bias,
            exact_point_cap=True, compute_dtype=jnp.bfloat16,
            precision="default", differentiable=True)

    cases = [
        ("s1_bin", s1_bin),
        ("s2_sort5op", s2_sort5),
        ("s2b_sort_packed", s2b_sort_packed),
        ("s3_kernel_after_5op", s3_kernel5),
        ("s3b_kernel_after_packed", s3b_kernel_packed),
        ("s4_affine_canvas", s4_full),
        ("s5_affine_canvas_diff", s5_full_diff),
    ]
    for name, fn in cases:
        dt = timed(fn, (pts16,)) * 1e6
        print(f"{name:26s} {dt:10.1f} us  ({dt / b:7.1f} us/scan)",
              flush=True)


if __name__ == "__main__":
    main()
