"""Bisect the f32/'highest' XLA-path compile hang (verify_tpu check 1b).

Stage 1 (isolated ops): every piece of the graph compiles in seconds on its
own — segscan_sum 9.2 s, segscan_max (n,64) f32 2.6 s, 'highest' matmul
0.8 s (segscan_max at a narrow (n,8) is an outlier at 40 s).  So the hang
is a COMBINATION blowup: XLA spends unbounded time fusing/scheduling the
full affine_canvas f32 graph, not any single HLO.

Stage 2 (this file): compile PREFIXES of the real affine_canvas XLA path
(use_pallas=False, f32/'highest', flagship shapes) with a watchdog per
case, to find the first prefix that hangs.
"""

import os
import signal
import sys
import time

sys.path.insert(0, ".")

# this probe intentionally compiles the guarded-off f32 XLA path on TPU
# (affine_canvas raises without it — docs/PARITY.md known #10)
os.environ["GNDNET_ALLOW_TPU_F32_XLA_SCAN"] = "1"

import numpy as np  # noqa: E402


def main():
    budget = int(sys.argv[sys.argv.index("--budget") + 1]) \
        if "--budget" in sys.argv else 240

    import jax
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
    pts = jnp.asarray(np.concatenate([scan, pad]))

    def case(name, fn):
        def on_alarm(signum, frame):
            raise TimeoutError()

        signal.signal(signal.SIGALRM, on_alarm)
        signal.alarm(budget)
        t0 = time.perf_counter()
        try:
            out = jax.jit(fn)(pts)
            jax.block_until_ready(out)
            print(f"{name:44s} {time.perf_counter() - t0:8.1f} s",
                  flush=True)
        except TimeoutError:
            print(f"{name:44s} TIMEOUT > {budget} s", flush=True)
        finally:
            signal.alarm(0)

    def prefix(upto):
        """Re-derive the affine_canvas XLA path up to a stage (mirrors
        pillarize.affine_canvas's use_pallas=False branch at b=1)."""

        def fn(p):
            ctx = pz.bin_points_batch(p[None], geom)
            mmat, w_clu, w_cen, bias = pz.affine_pfn_weights(
                mk, mb, p.shape[1], geom, False)
            b, n_per = 1, p.shape[0]
            c3 = geom.num_cells_3d
            stride = c3 + 1
            local = jnp.where(ctx.valid, ctx.cell, c3)
            iota = jnp.arange(n_per, dtype=jnp.int32)[None]
            local_s2, idx_s = jax.lax.sort(
                (local.reshape(1, n_per), iota), num_keys=1,
                is_stable=True, dimension=-1)
            spts2d = jnp.take_along_axis(
                p.reshape(1, n_per, 4), idx_s[..., None], axis=1)
            chunk = 1024
            padn = (-n_per) % chunk
            n_pad = n_per + padn
            if padn:
                local_s2 = jnp.pad(local_s2, ((0, 0), (0, padn)),
                                   constant_values=c3)
                spts2d = jnp.pad(spts2d, ((0, 0), (0, padn), (0, 0)))
            cell_s = local_s2.reshape(n_pad)
            spts = spts2d.reshape(n_pad, 4)
            valid = cell_s < c3
            if upto == "sort":
                return cell_s, spts
            pos = jnp.arange(n_pad, dtype=jnp.int32)
            flags = pz._segment_flags(cell_s)
            start_pos = jax.lax.cummax(jnp.where(flags, pos, 0))
            kept = valid & ((pos - start_pos) < cfg.max_points_voxel)
            keptf = kept.astype(jnp.float32)[:, None]
            if upto == "kept":
                return keptf
            xyz = spts[:, :3]
            g = jnp.concatenate([xyz * keptf, keptf], axis=-1)
            run_tot = pz.segmented_scan_sum(g, flags)
            if upto == "sum":
                return run_tot
            a = jnp.dot(spts, mmat, precision=jax.lax.Precision("highest"))
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
            a_masked = jnp.where(kept[:, None], a, neg)
            if upto == "act":
                return run_tot, a_masked
            if upto == "max_barrier":
                a_masked, flags = jax.lax.optimization_barrier(
                    (a_masked, flags))
            run_max = pz.segmented_scan_max(a_masked, flags)
            if upto in ("max", "max_barrier"):
                return run_tot, run_max
            ncells = c3
            cell_range = jnp.arange(ncells, dtype=cell_s.dtype)
            ends = jnp.searchsorted(cell_s, cell_range, side="right") - 1
            ends_c = jnp.clip(ends, 0, n_pad - 1)
            tot = run_tot[ends_c]
            smax = run_max[ends_c]
            hit = cell_s[ends_c] == cell_range
            count = jnp.where(hit, tot[:, 3], 0.0)
            if upto == "gather":
                return tot, smax, count
            mean = tot[:, :3] / jnp.maximum(count, 1.0)[:, None]
            nx = geom.nx
            cell_ids = jnp.arange(ncells, dtype=jnp.int32) % geom.num_cells_2d
            ccx = (cell_ids % nx).astype(jnp.float32)
            ccy = (cell_ids // nx).astype(jnp.float32)
            vx, vy = geom.voxel_size[0], geom.voxel_size[1]
            centers = jnp.stack(
                [ccx * vx + (vx / 2.0 + cfg.pc_range[0]),
                 ccy * vy + (vy / 2.0 + cfg.pc_range[1])], axis=-1)
            w_cell = (bias - mean @ w_clu - centers @ w_cen)
            canvas = jax.nn.relu(smax + w_cell)
            return canvas

        return fn

    stages = sys.argv[sys.argv.index("--stages") + 1].split(",") \
        if "--stages" in sys.argv else \
        ["sort", "kept", "sum", "act", "max", "gather", "full"]
    rng = np.random.default_rng(0)
    n_iso = 102400 + 1024
    vals64 = jnp.asarray(rng.normal(size=(n_iso, 64)).astype(np.float32))
    vals4 = jnp.asarray(rng.normal(size=(n_iso, 4)).astype(np.float32))
    iflags = jnp.asarray(np.sort(rng.random(n_iso)) < 0.1).at[0].set(True)

    for stage in stages:
        if stage == "two_scans":
            # isolated: BOTH associative scans in one program, inputs are
            # plain parameters — tests whether two scans alone blow up
            case("iso:sum+max two scans", lambda p: (
                pz.segmented_scan_sum(vals4 + p[0, 0], iflags),
                pz.segmented_scan_max(vals64 + p[0, 0], iflags)))
        elif stage == "max_flags_derived":
            # isolated max scan, but flags derived in-program from a sorted
            # cell array (tests flag-producer fusion alone)
            cs = jnp.asarray(np.sort(rng.integers(0, 10001, n_iso))
                             .astype(np.int32))
            case("iso:max flags-derived", lambda p: pz.segmented_scan_max(
                vals64 + p[0, 0], pz._segment_flags(cs)))
        elif stage == "canvas":
            case("affine_canvas use_pallas=False f32",
                 lambda p: pz.affine_canvas(
                     p, pz.bin_points_batch(p[None], geom), geom,
                     cfg.max_points_voxel, mk, mb, exact_point_cap=True,
                     compute_dtype=jnp.float32, precision="highest",
                     use_pallas=False))
        else:
            case(f"prefix:{stage}", prefix(stage))


if __name__ == "__main__":
    main()
