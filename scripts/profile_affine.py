"""Stage-level TPU profile of the affine serving path.

Marginal-cost methodology (see scripts/microbench.py): unroll slope inside
one lax.scan dispatch.  Run after frontend changes to see where the
milliseconds live.

Usage: python scripts/profile_affine.py [--reps 6]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def timed(fn, inputs, reps=48, dispatches=4):
    """Steady-state ring timing (the bench.py methodology): `reps` chained
    applications in ONE lax.scan dispatch, host-anchored, min over
    dispatches.  Every number includes the ~0.36 ms per-iteration dispatch
    quantum, so DIFFERENCES between variants attribute stage costs; the
    marginal-unroll trick is unreliable for large compound programs (the
    interleaved copies change XLA's scheduling)."""
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=48)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gndnet_tpu.config import kitti_sem_config
    from gndnet_tpu.models.gndnet import GroundEstimatorNet, init_model
    from gndnet_tpu.ops import pillarize as pz
    from gndnet_tpu.ops.postproc import segment_cloud

    print("backend:", jax.default_backend(), flush=True)
    cfg = kitti_sem_config().replace(
        compute_dtype="bfloat16", matmul_precision="default",
        fused_impl="affine")
    model = GroundEstimatorNet(cfg)
    _, variables = init_model(cfg)
    geom = pz.PillarGeometry.from_config(cfg)

    scan = np.load(
        "/root/reference/data/training/seq_000/reduced_velo/000000.npy"
    ).astype(np.float32)[:, :4]
    n_eng = 102400   # engine bucket-padded size (100000 -> 25 * 4096)
    pad = np.full((n_eng - scan.shape[0], 4), 1e3, np.float32)
    pts_eng = jnp.asarray(np.concatenate([scan, pad]))
    pts_raw = jnp.asarray(scan[:100000])
    pts16 = jnp.asarray(np.broadcast_to(scan[None, :100000], (16, 100000, 4))
                        .copy())

    def bump(i, p):
        return p + (i.astype(jnp.float32) * 1e-6) * jnp.asarray(
            [0, 0, 1, 0], jnp.float32)

    cases = {}
    cases["fused_fwd_100k"] = (
        lambda i, p: model.apply(variables, bump(i, p)[None], train=False,
                                 method=GroundEstimatorNet.fused), (pts_raw,))
    cases["fused_fwd_114k"] = (
        lambda i, p: model.apply(variables, bump(i, p)[None], train=False,
                                 method=GroundEstimatorNet.fused), (pts_eng,))
    cases["fused_fwd_B16"] = (
        lambda i, p: model.apply(variables, p + i.astype(jnp.float32) * 1e-6,
                                 train=False,
                                 method=GroundEstimatorNet.fused), (pts16,))

    elev = jnp.zeros((cfg.nx, cfg.ny), jnp.float32)
    cases["segment_cloud_114k"] = (
        lambda i, p: segment_cloud(bump(i, p), cfg.grid_range,
                                   cfg.voxel_size[0], elev, 0.08), (pts_eng,))

    # frontend pieces at engine size
    def cells_sorted(i, p):
        ctx = pz.bin_points_batch(bump(i, p)[None], geom)
        cols = tuple(p[:, k].reshape(1, -1) for k in range(4))
        return jax.lax.sort((ctx.cell.reshape(1, -1),) + cols, num_keys=1,
                            is_stable=True, dimension=-1)[0]
    cases["bin_sort_114k"] = (cells_sorted, (pts_eng,))

    def affine_canvas_only(i, p):
        ctx = pz.bin_points_batch(bump(i, p)[None], geom)
        layer_k = variables["params"]["voxel_feature_extractor"]["pfn_0"][
            "linear"]["kernel"]
        layer_b = variables["params"]["voxel_feature_extractor"]["pfn_0"][
            "linear"]["bias"]
        return pz.affine_canvas(
            bump(i, p), ctx, geom, cfg.max_points_voxel, layer_k, layer_b,
            compute_dtype=jnp.bfloat16, precision="default")
    cases["affine_canvas_114k"] = (affine_canvas_only, (pts_eng,))

    def segnet_only(i, canvas):
        return model.apply(
            variables, canvas + i.astype(jnp.bfloat16) * 1e-6, train=False,
            method=lambda m, c, train: m.encoder_decoder(c, train=train))
    canvas0 = jnp.zeros((1, cfg.ny, cfg.nx, 64), jnp.bfloat16)
    cases["segnet_100x100"] = (segnet_only, (canvas0,))

    from gndnet_tpu.ops.pallas_affine import histogram_ends
    loc = jnp.sort(jnp.asarray(
        np.random.default_rng(0).integers(0, 10001, (1, 114688))
        .astype(np.int32)), axis=-1)
    cases["histogram_ends_114k"] = (
        lambda i, c: histogram_ends(c + (i - i), cfg.ny, cfg.nx)[1], (loc,))
    loc16 = jnp.sort(jnp.asarray(
        np.random.default_rng(0).integers(0, 10001, (16, 100352))
        .astype(np.int32)), axis=-1)
    cases["histogram_ends_B16"] = (
        lambda i, c: histogram_ends(c + (i - i), cfg.ny, cfg.nx)[1], (loc16,))

    # kernel + sort variants at engine-padded size
    from gndnet_tpu.ops.pallas_affine import affine_segment_scan

    n_k = 102400
    cell_k = jnp.sort(jnp.asarray(np.random.default_rng(1)
                                  .integers(0, 10001, n_k).astype(np.int32)))
    pts8_k = jnp.asarray(np.concatenate(
        [np.random.default_rng(2).normal(size=(n_k, 3)).astype(np.float32),
         np.ones((n_k, 1), np.float32),
         np.random.default_rng(3).uniform(size=(n_k, 1)).astype(np.float32),
         np.zeros((n_k, 3), np.float32)], axis=1))
    mmat8_k = jnp.asarray(
        np.random.default_rng(4).normal(size=(8, 64)).astype(np.float32) * .3)

    for ck in (512, 1024, 2048):
        cases[f"kernel_only_102k_c{ck}"] = (
            (lambda ck: lambda i, c, p8, m8: affine_segment_scan(
                c, p8 + i.astype(jnp.float32) * 1e-6, m8,
                out_dtype=jnp.bfloat16, chunk=ck)[1])(ck),
            (cell_k, pts8_k, mmat8_k))

    from gndnet_tpu.ops.pallas_affine import affine_scan_t

    pts4t_k = jnp.asarray(np.asarray(pts8_k).T[:4].copy())
    valid_k = jnp.asarray(np.ones((n_k,), np.float32))
    mmat4t_k = jnp.asarray(np.asarray(mmat8_k).T[:, :4].copy())
    for ck in (512, 1024, 2048):
        cases[f"kernel_t_102k_c{ck}"] = (
            (lambda ck: lambda i, c, p4, v, m4: affine_scan_t(
                c, p4 + i.astype(jnp.float32) * 1e-6, v, m4,
                max_points=100, out_dtype=jnp.bfloat16, chunk=ck)[1])(ck),
            (cell_k, pts4t_k, valid_k, mmat4t_k))
    cases["kernel_t_102k_nocap"] = (
        lambda i, c, p4, v, m4: affine_scan_t(
            c, p4 + i.astype(jnp.float32) * 1e-6, v, m4,
            max_points=None, out_dtype=jnp.bfloat16, chunk=1024)[1],
        (cell_k, pts4t_k, valid_k, mmat4t_k))
    cases["kernel_t_102k_transposed_out"] = (
        lambda i, c, p4, v, m4: affine_scan_t(
            c, p4 + i.astype(jnp.float32) * 1e-6, v, m4,
            max_points=100, out_dtype=jnp.bfloat16, chunk=1024)[1].T,
        (cell_k, pts4t_k, valid_k, mmat4t_k))

    def front_to_maxt(i, p):
        """bin + packed sort + gather + pts8t assembly + kernel (no
        histogram/ends/epilogue) — isolates the stream half of
        affine_canvas."""
        p = bump(i, p)
        ctx = pz.bin_points_batch(p[None], geom)
        n = p.shape[0]
        c3 = geom.num_cells_3d
        local = jnp.where(ctx.valid, ctx.cell, c3)
        idxcap = 1 << max(n - 1, 1).bit_length()
        key = local * idxcap + jnp.arange(n, dtype=jnp.int32)
        skey = jax.lax.sort(key)
        local_s = skey // idxcap
        idx_s = skey - local_s * idxcap
        spts = p[idx_s]
        valid_s = (local_s < c3).astype(jnp.float32)
        pts4t = spts.T
        mk = variables["params"]["voxel_feature_extractor"]["pfn_0"][
            "linear"]["kernel"]
        mmat = pz.affine_pfn_weights(
            mk, jnp.zeros((mk.shape[1],)), 4, geom)[0]
        return affine_scan_t(
            local_s, pts4t, valid_s, mmat.T, max_points=100,
            out_dtype=jnp.bfloat16, chunk=2048)[1]
    cases["front_to_maxt_114k"] = (front_to_maxt, (pts_eng,))

    def sort1_packed(i, p):
        ctx = pz.bin_points_batch(bump(i, p)[None], geom)
        key = ctx.cell * jnp.int32(131072) + jnp.arange(
            p.shape[0], dtype=jnp.int32)
        skey = jax.lax.sort(key)
        idx = skey % 131072
        return p[idx]
    cases["sort1_packed_gather_114k"] = (sort1_packed, (pts_eng,))

    def sort2_stable(i, p):
        ctx = pz.bin_points_batch(bump(i, p)[None], geom)
        _, idx = jax.lax.sort(
            (ctx.cell, jnp.arange(p.shape[0], dtype=jnp.int32)),
            num_keys=1, is_stable=True)
        return p[idx]
    cases["sort2_idx_gather_114k"] = (sort2_stable, (pts_eng,))

    from gndnet_tpu.infer import GroundInferenceEngine

    engine = GroundInferenceEngine(cfg, variables, threshold=0.08,
                                   shift_cloud=True)
    cases["engine_run_114k"] = (
        lambda i, p: engine._run(variables, bump(i, p)), (pts_eng,))

    def fwd_plus_segment(i, p):
        pts = bump(i, p)
        pred = model.apply(variables, pts[None], train=False,
                           method=GroundEstimatorNet.fused)[0]
        return segment_cloud(pts, cfg.grid_range, cfg.voxel_size[0],
                             pred.T, 0.08)
    cases["fwd_plus_segment_114k"] = (fwd_plus_segment, (pts_eng,))

    def sort_b16(i, p):
        ctx = pz.bin_points_batch(p + i.astype(jnp.float32) * 1e-6, geom)
        cols = tuple(p[..., k] for k in range(4))
        return jax.lax.sort((ctx.cell.reshape(16, -1),) + cols, num_keys=1,
                            is_stable=True, dimension=-1)[0]
    cases["bin_sort_B16"] = (sort_b16, (pts16,))

    for name, (fn, inputs) in cases.items():
        if args.only and args.only not in name:
            continue
        try:
            dt = timed(fn, inputs, args.reps)
            print(f"{name:24s} {dt*1e6:10.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
