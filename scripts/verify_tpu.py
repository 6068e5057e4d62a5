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
  3. d(kernel) from the COMPILED Mosaic custom-VJP == the same custom-VJP
     graph in interpret mode on the same TPU backend (Mosaic lowering
     check), plus a 1e-3-rel gate vs CPU XLA autodiff on the real scan.
     At f32/'highest' the forward activations are BIT-equal across
     backends (probe_argpos.py), so no argmax winner flips occur and the
     true cross-backend delta is dot-order noise (~4e-7 rel; the 4.7e-2
     once blamed on winner flips was the denormal-flush routing bug
     below — real mis-routing measures 1e-2..0.44).
  4. TIGHT cotangent-routing gate on a duplicate-only fixture where
     argmax ties are exact ties between identical rows — immune to winner
     flips by construction, fails loudly on cotangent
     duplication/mis-routing/drops.  This gate caught a real one (round
     4): argmax positions rode the backward's payload gather as an
     int32->f32 BITCAST, and XLA:TPU's concatenate flushes denormal f32
     lanes (any position < 2**23) to zero — cotangents silently re-routed
     to stream position 0 (1.7e-2 rel d(kernel) on this fixture, both
     compiled and interpret, TPU only).  Fixed by encoding positions as
     exact integer-valued f32 (pallas_affine._make_scan_gather.bwd).
Exit code 0 iff all checks pass.

The f32 XLA references compile on the CPU backend, not the TPU: XLA's TPU
pipeline hits a super-linear compile blowup on the f32 affine graph (the
wide (N, 64) segmented associative-scan max combined with its producer
chain) — the isolated scan compiles in 2.6 s, adding one trivial producer
makes it 65 s, and the full path hangs past 40 min; `optimization_barrier`
around the scan inputs does NOT help, so it is not simple producer fusion
(bisect: scripts/probe_f32_compile.py).  The bf16 path never builds that
scan (it takes the intkey-cummax branch, pillarize.py) and stays TPU-vs-
TPU bit-exact.  A CPU-compiled reference is an INDEPENDENT lowering of the
same program — a stronger oracle than the same backend compiled twice.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    # make the CPU backend available next to the axon TPU (must precede
    # backend init); the f32 XLA references compile there — see module
    # docstring for the TPU-pipeline compile-blowup finding
    jax.config.update("jax_platforms", "axon,cpu")
    # affine_canvas's trace-time guard against the TPU f32 XLA compile
    # hang only sees the PROCESS default backend (tpu here); every
    # use_pallas=False f32 jit in this script explicitly targets
    # backend="cpu", so the guarded compile never happens — opt out
    # (docs/PARITY.md known #10)
    os.environ["GNDNET_ALLOW_TPU_F32_XLA_SCAN"] = "1"
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
        # via numpy: a and b may be committed to different backends
        a = np.asarray(a, dtype=np.float32)
        b = np.asarray(b, dtype=np.float32)
        d = float(np.max(np.abs(a - b)))
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
                  "(f32 runs fori_loop rounds; the pre-fix static unroll "
                  "took 5-11 min on the Mosaic service, docs/STATUS.md r2 "
                  "— post-fix both dtypes measure ~8-10 s)",
                  flush=True)
            # f32 reference on CPU (TPU pipeline compile blowup, see
            # module docstring); bf16 stays TPU-vs-TPU bit-exact
            ref_backend = "tpu" if dtype == jnp.bfloat16 else "cpu"
            f_xla = jax.jit(with_ctx(lambda p, ctx: pz.affine_canvas(
                p, ctx, geom, cfg.max_points_voxel, mk, mb,
                exact_point_cap=cap, compute_dtype=dtype, precision=prec,
                use_pallas=False)), backend=ref_backend)
            check(f"canvas {np.dtype(dtype).name} cap={cap} "
                  f"(ref: {ref_backend})",
                  out_pl, f_xla(np.asarray(pts)), tol)

    # 3: parameter-gradient parity, pallas custom VJP vs XLA autodiff
    pts_np = np.asarray(pts)

    def loss_of(use_pallas, backend, interpret=False, points=None,
                bias=None):
        source = pts_np if points is None else points
        b = mb if bias is None else bias

        def loss(kernel):
            p = jnp.asarray(source)
            ctx = pz.bin_points_batch(p[None], geom)
            c = pz.affine_canvas(
                p, ctx, geom, cfg.max_points_voxel, kernel, b,
                compute_dtype=jnp.float32, precision="highest",
                differentiable=True, use_pallas=use_pallas,
                interpret=interpret)
            return jnp.sum(c * c) / c.size
        return jax.jit(jax.grad(loss), backend=backend)

    # Grad check: COMPILED Mosaic custom-VJP vs the SAME graph in interpret
    # mode on the SAME TPU backend — isolates Mosaic lowering bugs
    # (measured 1.2e-7 rel).  The first-winner-vs-autodiff-tie-split
    # SEMANTICS are pinned on CPU by tests/test_pillarize.py's
    # duplicate-heavy grad-parity test.
    g_pl = np.asarray(loss_of(True, "tpu")(mk), np.float32)
    g_int = np.asarray(loss_of(True, "tpu", interpret=True)(mk), np.float32)
    scale = float(np.max(np.abs(g_int))) + 1e-12
    check("d(kernel) Mosaic-VJP vs interpret (tpu, rel)",
          g_pl / scale, g_int / scale, 3e-3)
    # Cross-backend vs CPU XLA autodiff on the real scan.  At
    # f32/'highest' the forward activations are BIT-equal across backends
    # (probe_argpos.py compared the scan outputs bitwise), so argmax
    # winner flips do not occur and the honest delta is dot-ORDER noise
    # in the two (C, A) contractions: measured 4.2e-7 rel.  Gated at
    # 1e-3 (~2000x headroom over noise; the two real routing bugs this
    # path has had measured 1.7e-2 [denormal-flushed bitcast positions]
    # and 0.44 [tie double-count] on this class of input).
    g_xla = np.asarray(loss_of(False, "cpu")(np.asarray(mk)), np.float32)
    xscale = float(np.max(np.abs(g_xla))) + 1e-12
    check("d(kernel) vs CPU XLA autodiff (real scan, rel)",
          g_pl / xscale, g_xla / xscale, 1e-3)

    # 4: TIGHT cotangent-routing gate on a fixture built so that CPU and
    # TPU compute BIT-IDENTICAL activations — then any cross-backend
    # d(kernel) delta is a routing bug, not a subgradient winner flip.
    # (The first cut of this check used random duplicated points and
    # still measured 1.97e-2: distinct random points sharing a cell
    # near-tie within backend rounding, and one flip moves d(kernel) by
    # ~1/sqrt(cells) — near-tie immunity needs EXACT arithmetic, not
    # just duplicate-heavy data.)  Construction:
    #   * features and the kernel quantized to 1/64: every per-point dot
    #     is a sum of exactly-representable 2^-12-grid products that
    #     fits f32's 24-bit mantissa, so TPU 'highest' (6-pass) and CPU
    #     (FMA) both produce the EXACT result;
    #   * ONE duplicate group per grid cell (10 exact copies each, the
    #     reference's resampling-with-replacement structure): the only
    #     argmax ties are between identical rows, where torch.max
    #     first-winner routing == autodiff tie-split identically, and
    #     the pre-fix double-count bug would inflate d(kernel) ~10x;
    #   * intensity == 1 for every point: the kernel's intensity row
    #     reads out the summed per-cell cotangent MASS, conserved under
    #     ANY winner choice — gated extra tight as the conservation law;
    #   * bias == +10 on every channel keeps relu off its boundary so
    #     the post-max epilogue cannot flip either.
    rng = np.random.default_rng(7)
    dup, q = 10, 64.0
    iy, ix = np.meshgrid(np.arange(1, cfg.ny), np.arange(1, cfg.nx),
                         indexing="ij")                  # 0 < idx interior
    uniq = iy.size
    base = np.empty((uniq, 4), np.float32)
    jit_q = rng.integers(-16, 17, size=(uniq, 2)) / q    # +-0.25, 1/64 grid
    base[:, 0] = cfg.grid_range[0] + ix.ravel() + 0.5 + jit_q[:, 0]
    base[:, 1] = cfg.grid_range[1] + iy.ravel() + 0.5 + jit_q[:, 1]
    base[:, 2] = rng.integers(-q, q + 1, size=uniq) / q  # z in [-1, 1]
    base[:, 3] = 1.0
    dup_scan = np.repeat(base, dup, axis=0)
    n_pad = pts_np.shape[0] - dup_scan.shape[0]
    assert n_pad >= 0, (uniq, dup)
    dup_scan = np.concatenate(
        [dup_scan, np.full((n_pad, 4), 1e9, np.float32)])
    mkq = jnp.asarray(np.round(np.asarray(mk) * q) / q)
    mbq = jnp.full_like(mb, 10.0)
    g_pl_d = np.asarray(
        loss_of(True, "tpu", points=dup_scan, bias=mbq)(mkq), np.float32)
    g_xla_d = np.asarray(
        loss_of(False, "cpu", points=dup_scan, bias=np.asarray(mbq))(
            np.asarray(mkq)), np.float32)
    dscale = float(np.max(np.abs(g_xla_d))) + 1e-12
    check("d(kernel) exact-tie routing (vs CPU autodiff, rel)",
          g_pl_d / dscale, g_xla_d / dscale, 1e-4)
    # intensity row = conserved cotangent mass (feature layout: raw
    # intensity is decorated-feature column 3 and has no derived offsets,
    # so d(mk)[3] maps 1:1 to the per-point matmul's mass readout)
    mrow = 3
    mscale = float(np.max(np.abs(g_xla_d[mrow]))) + 1e-12
    check("d(kernel) cotangent-mass row (conservation, rel)",
          g_pl_d[mrow] / mscale, g_xla_d[mrow] / mscale, 1e-5)

    print("RESULT:", "PASS" if failures == 0 else f"{failures} FAILURES",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
