"""Bitwise cross-backend comparison of the custom-VJP intermediates.

probe_tie_routing + /tmp/bisect_probe isolated the verify_tpu gate failure
(checks 5+6) to B-vs-C: the SAME interpret-mode custom-VJP graph gives
d(kernel) 1.7e-2 rel apart between the TPU and CPU backends, with d(bias)
matching (2.5e-7) and the forward canvas bit-equal — i.e. cotangents are
delivered to rows with the WRONG features on one backend.  This probe
feeds bit-identical prep arrays (captured once, eagerly, on CPU) to each
stage and compares the outputs bitwise:

  1. affine_scan_t fwd (tot, max, argpos)   — pair-scan f32 mode
  2. affine_bwd_dmmat on an identical `both` table

whichever stage diverges is the bug's home.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "axon,cpu")
    import jax.numpy as jnp

    from gndnet_tpu.config import kitti_sem_config
    from gndnet_tpu.models.gndnet import init_model
    from gndnet_tpu.ops import pillarize as pz
    from gndnet_tpu.ops import pallas_affine as pa

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from probe_tie_routing import dup_fixture

    cfg = kitti_sem_config()
    _, variables = init_model(cfg)
    geom = pz.PillarGeometry.from_config(cfg)
    mk = variables["params"]["voxel_feature_extractor"]["pfn_0"][
        "linear"]["kernel"]
    mkq = jnp.asarray(np.round(np.asarray(mk) * 64.0) / 64.0)
    mbq = jnp.full((mk.shape[1],), 10.0, mk.dtype)
    pts = dup_fixture(cfg)

    # ---- capture the prep arrays once (eager, CPU) ----------------------
    captured = {}
    orig = pa._make_scan_gather

    def capture_factory(*a, **k):
        sg = orig(*a, **k)

        def wrapper(cell_s, ends, starts, pts_t, valid, mmat_t):
            captured.update(
                cell_s=np.asarray(cell_s), ends=np.asarray(ends),
                starts=np.asarray(starts), pts_t=np.asarray(pts_t),
                valid=np.asarray(valid), mmat_t=np.asarray(mmat_t),
                cfg_args=a)
            return sg(cell_s, ends, starts, pts_t, valid, mmat_t)

        return wrapper

    pz_mod = sys.modules["gndnet_tpu.ops.pillarize"]
    t0 = time.perf_counter()
    try:
        pa_saved = pa._make_scan_gather
        pa._make_scan_gather = capture_factory
        with jax.default_device(jax.devices("cpu")[0]):
            p = jnp.asarray(pts)
            ctx = pz.bin_points_batch(p[None], geom)
            canvas_cpu = np.asarray(pz_mod.affine_canvas(
                p, ctx, geom, cfg.max_points_voxel, mkq, mbq,
                compute_dtype=jnp.float32, precision="highest",
                differentiable=True, use_pallas=True, interpret=True))
    finally:
        pa._make_scan_gather = pa_saved
    print(f"prep captured in {time.perf_counter() - t0:.0f}s; "
          f"n={captured['cell_s'].shape}", flush=True)
    max_points, out_dtype_name, chunk, _interp, b, c3, precision = \
        captured["cfg_args"]

    inputs = tuple(jnp.asarray(captured[k]) for k in
                   ("cell_s", "pts_t", "valid", "mmat_t"))

    def scan_fn(cell_s, pts_t, valid, mmat_t):
        return pa.affine_scan_t(
            cell_s, pts_t, valid, mmat_t, max_points=max_points,
            out_dtype=jnp.dtype(out_dtype_name), chunk=chunk,
            transpose_out=True, precision=precision, want_argmax=True,
            interpret=True)

    outs = {}
    for backend in ("tpu", "cpu"):
        t0 = time.perf_counter()
        outs[backend] = [np.asarray(x) for x in
                         jax.jit(scan_fn, backend=backend)(*inputs)]
        print(f"scan_t[{backend}] done in {time.perf_counter() - t0:.0f}s",
              flush=True)

    names = ["tot", "max", "argpos"]
    diverged = False
    for name, a, c in zip(names, outs["tpu"], outs["cpu"]):
        eq = np.array_equal(a, c)
        print(f"scan_t {name}: bit-equal {eq}", flush=True)
        if not eq:
            diverged = True
            d = (a != c)
            idx = np.argwhere(d)
            print(f"  {d.sum()} of {d.size} differ; first 8:", flush=True)
            for r in idx[:8]:
                r = tuple(r)
                print(f"   at {r}: tpu {a[r]!r} cpu {c[r]!r} "
                      f"cell {captured['cell_s'][r[0]]}", flush=True)

    if diverged:
        return

    # ---- stage 2: the backward kernel on an identical table -------------
    tot_t, max_nc, argpos_nc = outs["cpu"]
    ends = captured["ends"]
    argpos_g = argpos_nc[ends]
    rng = np.random.default_rng(3)
    d_max_g = rng.standard_normal(argpos_g.shape).astype(np.float32)
    width = argpos_g.shape[-1]
    table = np.concatenate(
        [argpos_g.view(np.float32), d_max_g], axis=-1)
    table = np.pad(table.reshape(b, c3, 2 * width),
                   ((0, 0), (0, 1), (0, 0))).reshape(-1, 2 * width)
    both = jnp.asarray(table)[jnp.asarray(captured["cell_s"])]

    def bwd_fn(cell_s, both, pts_t):
        return pa.affine_bwd_dmmat(
            cell_s, both, pts_t, width,
            out_dtype=jnp.dtype(out_dtype_name), chunk=chunk,
            precision=precision, interpret=True)

    bres = {}
    for backend in ("tpu", "cpu"):
        t0 = time.perf_counter()
        bres[backend] = np.asarray(jax.jit(bwd_fn, backend=backend)(
            inputs[0], both, inputs[1]))
        print(f"bwd_dmmat[{backend}] done in {time.perf_counter() - t0:.0f}s",
              flush=True)
    a, c = bres["tpu"], bres["cpu"]
    eq = np.array_equal(a, c)
    rel = float(np.max(np.abs(a - c))) / (float(np.max(np.abs(c))) + 1e-12)
    print(f"bwd_dmmat: bit-equal {eq}  rel {rel:.3e}", flush=True)
    if not eq:
        pr = np.max(np.abs(a - c), axis=1) / (np.max(np.abs(c)) + 1e-12)
        for r in range(a.shape[0]):
            print(f"  row {r}: rel {pr[r]:.3e}", flush=True)

    # ---- stage 3: the gathered-both construction itself ------------------
    def gather_fn(argpos_gj, d_max_gj, cell_sj):
        t = jnp.concatenate(
            [jax.lax.bitcast_convert_type(argpos_gj, jnp.float32),
             d_max_gj], axis=-1)
        t = jnp.pad(t.reshape(b, c3, 2 * width),
                    ((0, 0), (0, 1), (0, 0))).reshape(-1, 2 * width)
        return t[cell_sj]

    gres = {}
    for backend in ("tpu", "cpu"):
        gres[backend] = np.asarray(jax.jit(gather_fn, backend=backend)(
            jnp.asarray(argpos_g), jnp.asarray(d_max_g), inputs[0]))
    print("both-table gather: bit-equal",
          np.array_equal(gres["tpu"], gres["cpu"]), flush=True)


if __name__ == "__main__":
    main()
