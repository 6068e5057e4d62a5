"""On-device parity verification: the COMPILED Mosaic kernels vs the XLA
scan path, on the real KITTI fixture scan.

The test suite pins the pallas paths in interpret mode on CPU; this script
re-checks the actually-compiled kernels on the TPU (Mosaic lowering bugs
would only show here).  Run after kernel changes:

    python scripts/verify_tpu.py

Checks:
  1. affine_canvas pallas (compiled) == XLA scan path, f32/highest, both
     cap modes — tolerance only for float reassociation.
  2. Same in serving bf16.
  3. d(mmat) from the custom-VJP backward == jax.grad through the XLA
     differentiable path (same loss, same inputs).
Exit code 0 iff all checks pass.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from gndnet_tpu.config import kitti_sem_config
    from gndnet_tpu.models.gndnet import init_model
    from gndnet_tpu.ops import pillarize as pz

    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "tpu":
        print("WARNING: not on TPU — this exercises interpret mode only")

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
    def with_ctx(fn):
        """Bin INSIDE the jit: PointContext's static fields stay Python
        ints during tracing (a jitted bin wrapper would return them as
        arrays), and no eager per-op relay dispatches happen."""
        return lambda p, *a: fn(p, pz.bin_points_batch(p[None], geom), *a)

    failures = 0

    def check(name, a, b, tol):
        nonlocal failures
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        ok = d <= tol
        print(f"{name:44s} max|diff| {d:10.3e}  tol {tol:.0e}  "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        failures += 0 if ok else 1

    # 1 + 2: canvas parity, both precisions and cap modes
    # bf16 first: it is the serving configuration, and the f32/'highest'
    # pallas compile has been observed to take pathologically long on the
    # remote compile service — partial results still print.
    for dtype, prec, tol in ((jnp.bfloat16, "default", 5e-2),
                             (jnp.float32, "highest", 2e-4)):
        for cap in (True, False):
            print(f"compiling canvas {np.dtype(dtype).name} cap={cap} ...",
                  flush=True)
            f_pl = jax.jit(with_ctx(lambda p, ctx: pz.affine_canvas(
                p, ctx, geom, cfg.max_points_voxel, mk, mb,
                exact_point_cap=cap, compute_dtype=dtype, precision=prec,
                use_pallas=True)))
            t0 = time.perf_counter()
            out_pl = jax.block_until_ready(f_pl(pts))
            print(f"  pallas compile+run {time.perf_counter() - t0:.1f} s "
                  "(f32 runs fori_loop rounds — the static unroll compiled "
                  "in 5-11 min on the Mosaic service, docs/STATUS.md r2)",
                  flush=True)
            f_xla = jax.jit(with_ctx(lambda p, ctx: pz.affine_canvas(
                p, ctx, geom, cfg.max_points_voxel, mk, mb,
                exact_point_cap=cap, compute_dtype=dtype, precision=prec,
                use_pallas=False)))
            check(f"canvas {np.dtype(dtype).name} cap={cap}",
                  out_pl, f_xla(pts), tol)

    # 3: parameter-gradient parity, pallas custom VJP vs XLA autodiff
    def loss_of(use_pallas):
        def loss(kernel):
            ctx = pz.bin_points_batch(pts[None], geom)
            c = pz.affine_canvas(
                pts, ctx, geom, cfg.max_points_voxel, kernel, mb,
                compute_dtype=jnp.float32, precision="highest",
                differentiable=True, use_pallas=use_pallas)
            return jnp.sum(c * c) / c.size
        return jax.jit(jax.grad(loss))

    g_pl = loss_of(True)(mk)
    g_xla = loss_of(False)(mk)
    scale = float(jnp.max(jnp.abs(g_xla))) + 1e-12
    check("d(kernel) pallas-VJP vs XLA autodiff (rel)",
          g_pl / scale, g_xla / scale, 3e-3)

    print("RESULT:", "PASS" if failures == 0 else f"{failures} FAILURES",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
