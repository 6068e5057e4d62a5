"""Diagnose the verify_tpu exact-tie routing gate failure (checks 5+6).

On the duplicate-group fixture (every interior cell holds 10 exact copies
of one quantized point; activations should be exactly representable), the
TPU-compiled custom-VJP d(kernel) measured 1.7e-2 rel off CPU XLA autodiff
and the conserved-mass row 1.45e-2 — far above the exact-tie expectation
of ~0.  Four routes isolate where the delta enters:

  A  use_pallas=True,  tpu, compiled    (the production path)
  B  use_pallas=True,  tpu, interpret   (same custom-VJP graph, XLA ops)
  C  use_pallas=True,  cpu, interpret   (same graph, CPU backend)
  D  use_pallas=False, cpu              (XLA autodiff reference)

  A!=B  -> Mosaic lowering bug
  B!=C  -> backend arithmetic breaks the fixture's exactness assumption
  C!=D  -> custom-VJP semantics differ from autodiff even at exact ties

Also compares the forward canvases (A vs D) bitwise — the fixture's core
assumption — and the loss cotangent scale.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def dup_fixture(cfg):
    rng = np.random.default_rng(7)
    dup, q = 10, 64.0
    iy, ix = np.meshgrid(np.arange(1, cfg.ny), np.arange(1, cfg.nx),
                         indexing="ij")
    uniq = iy.size
    base = np.empty((uniq, 4), np.float32)
    jit_q = rng.integers(-16, 17, size=(uniq, 2)) / q
    base[:, 0] = cfg.grid_range[0] + ix.ravel() + 0.5 + jit_q[:, 0]
    base[:, 1] = cfg.grid_range[1] + iy.ravel() + 0.5 + jit_q[:, 1]
    base[:, 2] = rng.integers(-q, q + 1, size=uniq) / q
    base[:, 3] = 1.0
    scan = np.repeat(base, dup, axis=0)
    n_pad = 102400 - scan.shape[0]
    return np.concatenate([scan, np.full((n_pad, 4), 1e9, np.float32)])


def main():
    import jax

    jax.config.update("jax_platforms", "axon,cpu")
    os.environ["GNDNET_ALLOW_TPU_F32_XLA_SCAN"] = "1"
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
    mkq = jnp.asarray(np.round(np.asarray(mk) * 64.0) / 64.0)
    mbq = jnp.full((mk.shape[1],), 10.0, mk.dtype)
    pts = dup_fixture(cfg)

    def grad_of(use_pallas, backend, interpret=False):
        def loss(kernel):
            p = jnp.asarray(pts)
            ctx = pz.bin_points_batch(p[None], geom)
            c = pz.affine_canvas(
                p, ctx, geom, cfg.max_points_voxel, kernel, mbq,
                compute_dtype=jnp.float32, precision="highest",
                differentiable=True, use_pallas=use_pallas,
                interpret=interpret)
            return jnp.sum(c * c) / c.size
        return np.asarray(jax.jit(jax.grad(loss), backend=backend)(mkq),
                          np.float32)

    def canvas_of(use_pallas, backend, interpret=False):
        def fwd(kernel):
            p = jnp.asarray(pts)
            ctx = pz.bin_points_batch(p[None], geom)
            return pz.affine_canvas(
                p, ctx, geom, cfg.max_points_voxel, kernel, mbq,
                compute_dtype=jnp.float32, precision="highest",
                differentiable=True, use_pallas=use_pallas,
                interpret=interpret)
        return np.asarray(jax.jit(fwd, backend=backend)(mkq), np.float32)

    import time
    routes = {}
    for name, kw in (
        ("A tpu/pallas", dict(use_pallas=True, backend="tpu")),
        ("B tpu/interp", dict(use_pallas=True, backend="tpu",
                              interpret=True)),
        ("C cpu/interp", dict(use_pallas=True, backend="cpu",
                              interpret=True)),
        ("D cpu/xla-ad", dict(use_pallas=False, backend="cpu")),
    ):
        t0 = time.perf_counter()
        routes[name[0]] = grad_of(**kw)
        print(f"{name}: grad done in {time.perf_counter() - t0:.1f} s",
              flush=True)

    def rel(a, b):
        s = float(np.max(np.abs(b))) + 1e-12
        return float(np.max(np.abs(a - b))) / s

    for x, y in (("A", "B"), ("B", "C"), ("C", "D"), ("A", "D")):
        print(f"d(kernel) {x} vs {y}: rel {rel(routes[x], routes[y]):.3e}",
              flush=True)
    # conserved-mass row (raw intensity, feature col 3)
    for x, y in (("A", "B"), ("B", "C"), ("C", "D"), ("A", "D")):
        print(f"mass row  {x} vs {y}: rel "
              f"{rel(routes[x][3], routes[y][3]):.3e}", flush=True)

    ca = canvas_of(True, "tpu")
    cd = canvas_of(False, "cpu")
    print("canvas A vs D: bit-equal", bool(np.array_equal(ca, cd)),
          " max|diff|", float(np.max(np.abs(ca - cd))), flush=True)


if __name__ == "__main__":
    main()
