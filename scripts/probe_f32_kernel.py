"""Isolate the f32 affine_scan_t compiled-vs-interpret mismatch.

verify_tpu (with CPU f32 references) found max|diff| ~0.29 on the f32
canvas while bf16 is bit-exact — the f32 kernel branch (in-kernel fori_loop
combine rounds + pltpu.roll with dynamic shift) had never been
VALUE-verified compiled on device (the old f32 check always hung in the
XLA baseline compile first).  This probe compares, at small N on random
data:

  compiled TPU affine_scan_t   vs   interpret-mode (CPU semantics) oracle

for f32/bf16 x transpose_out on/off x cap on/off, to pin which branch
miscompiles.
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from gndnet_tpu.ops.pallas_affine import affine_scan_t

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n = 8192
    chunk = 1024
    ncell = 500
    cell = jnp.asarray(np.sort(rng.integers(0, ncell + 1, n))
                       .astype(np.int32))
    pts_t = jnp.asarray(rng.normal(size=(4, n)).astype(np.float32))
    valid = jnp.asarray((rng.random(n) < 0.9).astype(np.float32))[None]
    mmat_t = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32) * 0.3)

    for dtype in (jnp.float32, jnp.bfloat16):
        for tout in (False, True):
            for cap in (100, None):
                kw = dict(max_points=cap, out_dtype=dtype, chunk=chunk,
                          transpose_out=tout)
                ref = affine_scan_t(cell, pts_t, valid, mmat_t,
                                    interpret=True, **kw)
                got = jax.jit(
                    lambda c, p, v, m: affine_scan_t(c, p, v, m, **kw)
                )(cell, pts_t, valid, mmat_t)
                ds = [float(jnp.max(jnp.abs(
                    np.asarray(a, np.float32) - np.asarray(b, np.float32))))
                    for a, b in zip(ref, got)]
                name = (f"{np.dtype(dtype).name:8s} tout={int(tout)} "
                        f"cap={cap}")
                print(f"{name:28s} tot|max diffs: {ds[0]:.3e} {ds[1]:.3e}",
                      flush=True)


if __name__ == "__main__" and "--bwd" not in sys.argv:
    main()


def bwd_check():
    """Compiled-vs-interpret check for affine_bwd_dmmat (the fused
    argpos-selecting d(mmat) backward kernel) at small N, f32 and bf16.
    The table is [bitcast(argpos) | d_smax] f32; random positions hit
    ~1/n of rows — enough to exercise the selection + contraction."""
    import jax
    import jax.numpy as jnp

    from gndnet_tpu.ops.pallas_affine import affine_bwd_dmmat

    rng = np.random.default_rng(1)
    n = 8192
    chunk = 1024
    cell = jnp.asarray(np.sort(rng.integers(0, 501, n)).astype(np.int32))
    pts_t = jnp.asarray(rng.normal(size=(4, n)).astype(np.float32))

    for dtype in (jnp.float32, jnp.bfloat16):
        argpos = rng.integers(0, n, (n, 64)).astype(np.int32)
        ds = rng.normal(size=(n, 64)).astype(np.float32)
        both = jnp.asarray(np.concatenate(
            [argpos.view(np.float32), ds], axis=1))
        for prec in (None, "highest"):
            kw = dict(out_dtype=dtype, chunk=chunk, precision=prec)
            ref = affine_bwd_dmmat(cell, both, pts_t, 64,
                                   interpret=True, **kw)
            got = jax.jit(lambda c, b, p: affine_bwd_dmmat(
                c, b, p, 64, **kw))(cell, both, pts_t)
            d = float(jnp.max(jnp.abs(ref - got)))
            scale = float(jnp.max(jnp.abs(ref))) + 1e-12
            print(f"bwd {np.dtype(dtype).name:8s} "
                  f"prec={prec}: max|diff| {d:.3e} (rel {d/scale:.1e})",
                  flush=True)


if __name__ == "__main__" and "--bwd" in sys.argv:
    bwd_check()
