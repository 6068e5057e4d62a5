"""Golden + oracle-parity tests for the fixed-shape pillarizer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gndnet_tpu.ops.pillarize import (
    PillarGeometry,
    bin_points,
    count_and_rank,
    decorate_pillars,
    decorate_points,
    pillarize,
    scatter_max_canvas,
)
from oracles import decorate_oracle, voxelize_oracle

GEOM = PillarGeometry(
    pc_range=(0.0, 0.0, -4.0, 8.0, 8.0, 4.0),
    voxel_size=(1.0, 1.0, 8.0),
    grid_size=(8, 8, 1),
)


def make_cloud(rng, n=500, f=4, lo=(-1, -1, -5), hi=(9, 9, 5)):
    pts = rng.uniform(size=(n, f)).astype(np.float32)
    pts[:, :3] = pts[:, :3] * (np.array(hi) - np.array(lo)) + np.array(lo)
    return pts


def test_bin_points_golden():
    pts = np.array(
        [
            [0.5, 0.5, 0.0, 1.0],   # cell (0,0)
            [7.99, 0.5, 0.0, 1.0],  # cell (7,0)
            [8.0, 0.5, 0.0, 1.0],   # x at upper edge -> invalid
            [-0.01, 0.5, 0.0, 1.0],  # below -> invalid
            [3.2, 6.9, 3.99, 1.0],  # cell (3,6)
            [3.2, 6.9, 4.0, 1.0],   # z at upper edge -> invalid
        ],
        np.float32,
    )
    bins = bin_points(jnp.asarray(pts), GEOM)
    np.testing.assert_array_equal(
        np.asarray(bins.valid), [True, True, False, False, True, False]
    )
    np.testing.assert_array_equal(np.asarray(bins.cx)[[0, 1, 4]], [0, 7, 3])
    np.testing.assert_array_equal(np.asarray(bins.cy)[[0, 1, 4]], [0, 0, 6])
    np.testing.assert_array_equal(np.asarray(bins.cell)[[0, 1, 4]], [0, 7, 51])
    assert np.asarray(bins.cell)[2] == GEOM.num_cells_3d


def test_rank_within_cell():
    # 4 points in cell (0,0), 2 in cell (1,0), in interleaved stream order.
    pts = np.array(
        [
            [0.1, 0.1, 0, 0],
            [1.1, 0.1, 0, 0],
            [0.2, 0.2, 0, 0],
            [0.3, 0.3, 0, 0],
            [1.2, 0.2, 0, 0],
            [0.4, 0.4, 0, 0],
        ],
        np.float32,
    )
    bins = bin_points(jnp.asarray(pts), GEOM)
    ranks = count_and_rank(bins, max_points=3)
    np.testing.assert_array_equal(np.asarray(ranks.rank), [0, 0, 1, 2, 1, 3])
    np.testing.assert_array_equal(
        np.asarray(ranks.kept), [True, True, True, True, True, False]
    )
    assert np.asarray(ranks.cell_count)[0] == 3  # capped at max_points
    assert np.asarray(ranks.cell_count)[1] == 2
    assert np.asarray(ranks.raw_count)[0] == 4


@pytest.mark.parametrize("max_points,max_voxels", [(5, 64), (2, 64), (5, 8)])
def test_pillarize_matches_oracle(rng, max_points, max_voxels):
    pts = make_cloud(rng)
    ov, oc, on = voxelize_oracle(
        pts, GEOM.voxel_size, GEOM.pc_range, max_points, max_voxels,
        reference_break=False,  # our documented capacity semantics
    )
    got = jax.jit(
        lambda p: pillarize(p, GEOM, max_points, max_voxels)
    )(jnp.asarray(pts))
    n = int(got.n_pillars)
    assert n == ov.shape[0]
    np.testing.assert_array_equal(np.asarray(got.coors)[:n], oc)
    np.testing.assert_array_equal(np.asarray(got.num_points)[:n], on)
    np.testing.assert_allclose(np.asarray(got.voxels)[:n], ov, rtol=0, atol=0)
    # Padding slots must be zero.
    assert np.all(np.asarray(got.voxels)[n:] == 0)
    assert np.all(np.asarray(got.mask)[:n])
    assert not np.any(np.asarray(got.mask)[n:])


def test_pillarize_matches_oracle_with_reference_break(rng):
    """When pillar capacity is never exceeded (the shipped configs size
    max_voxels >= cell count), our semantics and the reference's break
    semantics coincide exactly."""
    pts = make_cloud(rng, n=300)
    ov, oc, on = voxelize_oracle(
        pts, GEOM.voxel_size, GEOM.pc_range, 10, 64, reference_break=True)
    got = pillarize(jnp.asarray(pts), GEOM, 10, 64)
    n = int(got.n_pillars)
    assert n == ov.shape[0]
    np.testing.assert_array_equal(np.asarray(got.coors)[:n], oc)
    np.testing.assert_allclose(np.asarray(got.voxels)[:n], ov)


def test_decorate_pillars_matches_oracle(rng):
    pts = make_cloud(rng, n=400)
    got = pillarize(jnp.asarray(pts), GEOM, 5, 64)
    n = int(got.n_pillars)
    coors_xy = np.asarray(got.coors)[:, [2, 1]]
    want = decorate_oracle(
        np.asarray(got.voxels)[:n], np.asarray(got.num_points)[:n],
        coors_xy[:n], GEOM.voxel_size, GEOM.pc_range, with_distance=True)
    dec = decorate_pillars(
        got.voxels, got.num_points, jnp.asarray(coors_xy), GEOM, 5,
        with_distance=True)
    np.testing.assert_allclose(np.asarray(dec)[:n], want, rtol=1e-5, atol=1e-5)
    assert dec.shape == (64, 5, 4 + 5 + 1)


def test_decorate_points_matches_pillar_decoration(rng):
    """The fused flat decoration must agree with the materialized-pillar
    decoration for every kept point."""
    pts = make_cloud(rng, n=400)
    max_points = 5
    bins = bin_points(jnp.asarray(pts), GEOM)
    ranks = count_and_rank(bins, max_points)
    flat, kept = decorate_points(jnp.asarray(pts), bins, ranks, GEOM,
                                 with_distance=True)

    pb = pillarize(jnp.asarray(pts), GEOM, max_points, 64)
    coors_xy = pb.coors[:, [2, 1]]
    dec = decorate_pillars(pb.voxels, pb.num_points, coors_xy, GEOM,
                           max_points, with_distance=True)

    # Match each kept point to its pillar row by value of raw xyz.
    flat_np = np.asarray(flat)
    kept_np = np.asarray(kept)
    dec_np = np.asarray(dec).reshape(-1, flat_np.shape[-1])
    dec_rows = {tuple(np.round(r[:3], 5)): r for r in dec_np if np.any(r)}
    checked = 0
    for i in range(pts.shape[0]):
        if not kept_np[i]:
            assert np.all(flat_np[i] == 0)
            continue
        key = tuple(np.round(pts[i, :3], 5))
        assert key in dec_rows
        np.testing.assert_allclose(flat_np[i], dec_rows[key], rtol=1e-4,
                                   atol=1e-5)
        checked += 1
    assert checked > 100


def test_scatter_max_canvas_golden():
    # Two cells: (y=0,x=0) with 2 points, (y=2,x=1) with 1 point.
    pts = np.array(
        [[0.1, 0.1, 0, 0], [0.2, 0.2, 0, 0], [1.5, 2.5, 0, 0]], np.float32)
    bins = bin_points(jnp.asarray(pts), GEOM)
    ranks = count_and_rank(bins, max_points=4)
    feats = jnp.asarray(
        np.array([[1.0, 5.0], [2.0, 3.0], [7.0, 0.5]], np.float32))
    canvas = scatter_max_canvas(feats, bins, ranks, GEOM, max_points=4)
    assert canvas.shape == (1, 8, 8, 2)
    canvas = np.asarray(canvas)[0]
    np.testing.assert_allclose(canvas[0, 0], [2.0, 5.0])
    np.testing.assert_allclose(canvas[2, 1], [7.0, 0.5])
    assert np.count_nonzero(canvas) == 4

    # padding-row floor: both cells have < max_points points.
    floor = jnp.asarray(np.array([3.0, 4.0], np.float32))
    canvas2 = np.asarray(
        scatter_max_canvas(feats, bins, ranks, GEOM, 4, pad_floor=floor))[0]
    np.testing.assert_allclose(canvas2[0, 0], [3.0, 5.0])
    np.testing.assert_allclose(canvas2[2, 1], [7.0, 4.0])
    assert np.all(canvas2[1, 1] == 0)  # empty cells stay zero


def test_pillarize_handles_all_invalid():
    pts = np.full((10, 4), 100.0, np.float32)
    got = pillarize(jnp.asarray(pts), GEOM, 5, 16)
    assert int(got.n_pillars) == 0
    assert not np.any(np.asarray(got.mask))
    assert np.all(np.asarray(got.voxels) == 0)


def test_pillarize_capacity_overflow_keeps_earliest(rng):
    """More distinct cells than max_voxels: we keep the earliest-created
    pillars with ALL their points (documented deviation from the reference's
    break-and-drop, utils/point_cloud_ops.py:43-45)."""
    pts = make_cloud(rng, n=200, lo=(0, 0, -1), hi=(8, 8, 1))
    got = pillarize(jnp.asarray(pts), GEOM, 8, 4)
    ov, oc, on = voxelize_oracle(
        pts, GEOM.voxel_size, GEOM.pc_range, 8, 4, reference_break=False)
    assert int(got.n_pillars) == 4
    np.testing.assert_array_equal(np.asarray(got.coors)[:4], oc)
    np.testing.assert_array_equal(np.asarray(got.num_points)[:4], on)
    np.testing.assert_allclose(np.asarray(got.voxels)[:4], ov)


def test_fused_frontend_matches_legacy_pieces(rng):
    """fused_frontend (single scatter+gather) must equal decorate_points +
    count_and_rank composition."""
    from gndnet_tpu.ops.pillarize import fused_frontend

    pts = make_cloud(rng, n=400)
    max_points = 5
    bins = bin_points(jnp.asarray(pts), GEOM)
    ranks = count_and_rank(bins, max_points)
    want_dec, want_kept = decorate_points(jnp.asarray(pts), bins, ranks, GEOM,
                                          with_distance=True)
    dec, kept, counts = fused_frontend(jnp.asarray(pts), bins, GEOM,
                                       max_points, with_distance=True)
    np.testing.assert_array_equal(np.asarray(kept), np.asarray(want_kept))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(want_dec),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(counts),
        np.asarray(ranks.cell_count)[: bins.num_segments - 1])


def test_fused_frontend_no_cap(rng):
    """exact_point_cap=False keeps every in-range point (documented serving
    deviation)."""
    from gndnet_tpu.ops.pillarize import fused_frontend

    dup = np.tile(np.array([[0.5, 0.5, 0.0, 1.0]], np.float32), (30, 1))
    bins = bin_points(jnp.asarray(dup), GEOM)
    _, kept, counts = fused_frontend(jnp.asarray(dup), bins, GEOM,
                                     max_points=5, exact_point_cap=False)
    assert np.asarray(kept).all()
    assert np.asarray(counts)[0] == 30


@pytest.mark.slow
def test_sorted_frontend_matches_scatter_frontend(rng):
    """fused_impl='sorted' (pallas interpret on CPU) must agree with the
    scatter implementation for both cap modes."""
    from gndnet_tpu.ops.pillarize import (
        bin_points_batch,
        canvas_from_activations,
        canvas_from_sorted_activations,
        fused_frontend,
        fused_frontend_sorted,
    )

    pts = np.stack([make_cloud(rng, n=300), make_cloud(rng, n=300)])
    ctx = bin_points_batch(jnp.asarray(pts), GEOM)
    flat = jnp.asarray(pts.reshape(-1, 4))
    w = jnp.asarray(rng.normal(size=(9, 16)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
    floor = jnp.maximum(b, 0)

    for cap in (True, False):
        dec_a, kept_a, count_a = fused_frontend(flat, ctx, GEOM, 5,
                                                exact_point_cap=cap)
        acts_a = jnp.maximum(dec_a @ w + b, 0)
        canvas_a = canvas_from_activations(acts_a, ctx, kept_a, count_a,
                                           GEOM, 5, pad_floor=floor)

        dec_s, kept_s, cell_s, count_s = fused_frontend_sorted(
            flat, ctx, GEOM, 5, exact_point_cap=cap, chunk=128,
            interpret=True)
        acts_s = jnp.maximum(dec_s @ w + b, 0)
        canvas_s = canvas_from_sorted_activations(
            acts_s, kept_s, cell_s, count_s, ctx, GEOM, 5, pad_floor=floor,
            chunk=128, interpret=True)

        np.testing.assert_array_equal(np.asarray(count_a),
                                      np.asarray(count_s))
        np.testing.assert_allclose(np.asarray(canvas_s),
                                   np.asarray(canvas_a),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sorted_impl_through_model(rng):
    """GroundEstimatorNet with fused_impl='sorted' == 'scatter' end to end."""
    from gndnet_tpu.config import GndNetConfig
    from gndnet_tpu.models.gndnet import GroundEstimatorNet, init_model

    cfg = GndNetConfig(
        pc_range=(0.0, -8.0, -4.0, 16.0, 8.0, 4.0),
        grid_range=(0.0, -8.0, 16.0, 8.0),
        voxel_size=(1.0, 1.0, 8.0),
        max_points_voxel=20, max_voxels=256, input_features=4)
    model_a, variables = init_model(cfg)
    pts = np.stack([make_cloud(rng, n=400, lo=(0, -8, -4), hi=(16, 8, 4))])
    out_a = model_a.apply(variables, jnp.asarray(pts), train=False,
                          method=GroundEstimatorNet.fused)
    model_b = GroundEstimatorNet(cfg.replace(fused_impl="sorted"))
    out_b = model_b.apply(variables, jnp.asarray(pts), train=False,
                          method=GroundEstimatorNet.fused)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_affine_canvas_matches_scatter_frontend(rng):
    """fused_impl='affine' (sort + segmented scans + affine PFN split) must
    agree with the scatter frontend to float-reassociation tolerance, for
    both cap modes, with and without the distance feature, and its counts /
    kept set must be bit-identical."""
    from gndnet_tpu.ops.pillarize import (
        affine_canvas,
        bin_points_batch,
        canvas_from_activations,
        fused_frontend,
    )

    pts = np.stack([make_cloud(rng, n=300), make_cloud(rng, n=300)])
    ctx = bin_points_batch(jnp.asarray(pts), GEOM)
    flat = jnp.asarray(pts.reshape(-1, 4))

    for with_dist in (False, True):
        d = 9 + int(with_dist)
        w = jnp.asarray(rng.normal(size=(d, 16)).astype(np.float32) * 0.3)
        b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
        floor = jnp.maximum(b, 0)
        for cap in (True, False):
            dec_a, kept_a, count_a = fused_frontend(
                flat, ctx, GEOM, 5, exact_point_cap=cap,
                with_distance=with_dist)
            acts_a = jnp.maximum(dec_a @ w + b, 0)
            canvas_a = canvas_from_activations(
                acts_a, ctx, kept_a, count_a, GEOM, 5, pad_floor=floor)

            canvas_f = affine_canvas(
                flat, ctx, GEOM, 5, w, b, with_distance=with_dist,
                exact_point_cap=cap)
            np.testing.assert_allclose(np.asarray(canvas_f),
                                       np.asarray(canvas_a),
                                       rtol=1e-4, atol=1e-5)


def test_affine_vjp_duplicate_ties_match_autodiff(rng):
    """d(kernel) through the pallas custom VJP == XLA autodiff when the
    cloud is ~45% DUPLICATED points (the reference's fixed-size scans
    sample with replacement — reduced_velo frames duplicate ~30% of rows).

    Every duplicated point is an exact per-cell argmax tie.  The VJP
    routes the whole cotangent to the FIRST kept max row (torch.max
    semantics); autodiff splits it across the maximum chain — for
    identical rows both sum to the same d(kernel), so this must match
    tightly.  The round-3 2-ULP value-window backward failed exactly here
    (every tied duplicate double-counted its gradient: 0.44 rel error on
    the real fixture, scripts/verify_tpu.py caught it)."""
    from gndnet_tpu.ops.pillarize import affine_canvas, bin_points_batch

    base = make_cloud(rng, n=600)
    dup = base[rng.integers(0, 600, 424)]
    pts = np.concatenate([base, dup]).astype(np.float32)[None]
    ctx = bin_points_batch(jnp.asarray(pts), GEOM)
    flat = jnp.asarray(pts.reshape(-1, 4))
    w = jnp.asarray(rng.normal(size=(9, 16)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)

    def loss_of(use_pallas):
        def loss(kernel):
            c = affine_canvas(flat, ctx, GEOM, 5, kernel, b,
                              differentiable=True, use_pallas=use_pallas,
                              interpret=use_pallas)
            return jnp.sum(c * c) / c.size
        return jax.jit(jax.grad(loss))

    g_pl = np.asarray(loss_of(True)(w))
    g_ad = np.asarray(loss_of(False)(w))
    scale = np.abs(g_ad).max() + 1e-12
    np.testing.assert_allclose(g_pl / scale, g_ad / scale,
                               rtol=0, atol=1e-5)


@pytest.mark.slow
def test_affine_vjp_bf16_packed_argmax():
    """The bf16 training VJP uses the PACKED argmax scan (mono16(value)
    << 12 | inverted rank in one i32 key, plain max scan): its forward
    canvas must be BIT-identical to the primal bf16 path, and d(kernel)
    must track XLA autodiff within bf16 rounding noise (distinct points
    whose activations collide after bf16 rounding get first-winner
    routing vs autodiff's tie split — torch.max picks the first too).

    Local fixed-seed rng, NOT the session fixture: the grad tolerance is
    calibrated against how many near-tie routing flips a draw produces,
    and the session rng's draw here shifts whenever an earlier test file
    changes."""
    from gndnet_tpu.ops.pillarize import affine_canvas, bin_points_batch

    rng = np.random.default_rng(1234)
    base = make_cloud(rng, n=600)
    dup = base[rng.integers(0, 600, 424)]
    pts = np.concatenate([base, dup]).astype(np.float32)[None]
    ctx = bin_points_batch(jnp.asarray(pts), GEOM)
    flat = jnp.asarray(pts.reshape(-1, 4))
    w = jnp.asarray(rng.normal(size=(9, 16)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)

    kwargs = dict(compute_dtype=jnp.bfloat16, differentiable=True)
    c_primal = affine_canvas(flat, ctx, GEOM, 5, w, b, use_pallas=True,
                             interpret=True, **kwargs)
    c_fwd, _ = jax.vjp(lambda kk: affine_canvas(
        flat, ctx, GEOM, 5, kk, b, use_pallas=True, interpret=True,
        **kwargs), w)
    np.testing.assert_array_equal(np.asarray(c_fwd, np.float32),
                                  np.asarray(c_primal, np.float32))

    def loss_of(use_pallas):
        def loss(kernel):
            c = affine_canvas(flat, ctx, GEOM, 5, kernel, b,
                              use_pallas=use_pallas, interpret=use_pallas,
                              **kwargs)
            return jnp.sum(c.astype(jnp.float32) ** 2) / c.size
        return jax.jit(jax.grad(loss))

    g_pl = np.asarray(loss_of(True)(w))
    g_ad = np.asarray(loss_of(False)(w))
    scale = np.abs(g_ad).max() + 1e-12
    np.testing.assert_allclose(g_pl / scale, g_ad / scale,
                               rtol=0, atol=4e-3)


@pytest.mark.slow
def test_affine_canvas_bf16_intkey_path(rng):
    """bf16 compute triggers the int-key cummax segmax; it must equal the
    associative-scan segmax bit for bit (both are exact maxima of the same
    bf16 values)."""
    from gndnet_tpu.ops.pillarize import affine_canvas, bin_points_batch

    pts = np.stack([make_cloud(rng, n=400)])
    ctx = bin_points_batch(jnp.asarray(pts), GEOM)
    flat = jnp.asarray(pts.reshape(-1, 4))
    w = jnp.asarray(rng.normal(size=(9, 16)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)

    intkey = affine_canvas(flat, ctx, GEOM, 5, w, b,
                           compute_dtype=jnp.bfloat16, differentiable=False)
    scan = affine_canvas(flat, ctx, GEOM, 5, w, b,
                         compute_dtype=jnp.bfloat16, differentiable=True)
    assert intkey.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(scan, np.float32),
                                  np.asarray(intkey, np.float32))


@pytest.mark.slow
def test_affine_impl_through_model():
    """GroundEstimatorNet with fused_impl='affine' == 'scatter' end to end,
    forward and gradients.

    Uses a LOCAL seeded rng (not the session fixture) so the cloud is the
    same standalone and in-suite, and norm-based gradient bounds: the two
    impls' canvases differ by float reassociation (~1e-5), which the
    untrained random conv stack amplifies ~1e3x into the gradients
    (docs/STATUS.md "chaos-amplification"), so ELEMENTWISE grad bounds
    fail on entries whose magnitude is below that noise floor for some
    clouds.  On the real fixture scan the f32 grads are bit-exact
    (scripts/verify_tpu.py)."""
    from gndnet_tpu.config import GndNetConfig
    from gndnet_tpu.models.gndnet import GroundEstimatorNet, init_model

    rng = np.random.default_rng(1234)
    cfg = GndNetConfig(
        pc_range=(0.0, -8.0, -4.0, 16.0, 8.0, 4.0),
        grid_range=(0.0, -8.0, 16.0, 8.0),
        voxel_size=(1.0, 1.0, 8.0),
        max_points_voxel=20, max_voxels=256, input_features=4)
    model_a, variables = init_model(cfg)
    pts = np.stack([make_cloud(rng, n=400, lo=(0, -8, -4), hi=(16, 8, 4))])
    out_a = model_a.apply(variables, jnp.asarray(pts), train=False,
                          method=GroundEstimatorNet.fused)
    model_b = GroundEstimatorNet(cfg.replace(fused_impl="affine"))
    out_b = model_b.apply(variables, jnp.asarray(pts), train=False,
                          method=GroundEstimatorNet.fused)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                               rtol=1e-4, atol=1e-5)

    # gradients flow through the train path: on CPU, train=True runs the
    # pallas kernel in interpret mode through the custom VJP (params-only
    # grads), pinned here against the scatter impl's XLA autodiff
    def loss(m, v):
        pred, _ = m.apply(v, jnp.asarray(pts), train=True,
                          mutable=["batch_stats"],
                          method=GroundEstimatorNet.fused)
        return jnp.mean(pred ** 2)

    g_a = jax.grad(lambda v: loss(model_a, v))(variables)["params"]
    g_b = jax.grad(lambda v: loss(model_b, v))(variables)["params"]
    flat_a = jax.tree_util.tree_leaves_with_path(g_a)
    flat_b = jax.tree_util.tree_leaves(g_b)
    for (path, xa), xb in zip(flat_a, flat_b):
        xa = np.asarray(xa, np.float64)
        xb = np.asarray(xb, np.float64)
        # mixed bound: conv-before-BN bias grads are analytically ~0 (BN
        # subtracts the mean), so a pure relative norm is 0/0 noise there
        err = np.linalg.norm(xb - xa)
        assert err <= 5e-3 * np.linalg.norm(xa) + 1e-6, (
            jax.tree_util.keystr(path), err, np.linalg.norm(xa))


@pytest.mark.slow
def test_affine_use_norm_folds_bn(rng):
    """use_norm=True eval-mode BN folds into the affine weights: affine path
    == pillar path on a BN model."""
    from gndnet_tpu.config import GndNetConfig
    from gndnet_tpu.models.gndnet import GroundEstimatorNet, init_model
    from gndnet_tpu.ops.pillarize import pillarize_batch, PillarGeometry

    cfg = GndNetConfig(
        pc_range=(0.0, -8.0, -4.0, 16.0, 8.0, 4.0),
        grid_range=(0.0, -8.0, 16.0, 8.0),
        voxel_size=(1.0, 1.0, 8.0),
        max_points_voxel=20, max_voxels=256, input_features=4,
        use_norm=True)
    model, variables = init_model(cfg)
    # make running stats non-trivial so folding is actually exercised
    bs = jax.tree_util.tree_map(
        lambda x: x + jnp.asarray(
            rng.uniform(0.1, 0.5, x.shape).astype(np.float32)),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    pts = np.stack([make_cloud(rng, n=400, lo=(0, -8, -4), hi=(16, 8, 4))])
    geom = PillarGeometry.from_config(cfg)
    batch = pillarize_batch(jnp.asarray(pts), geom, cfg.max_points_voxel,
                            cfg.max_voxels)
    out_ref = model.apply(variables, batch.voxels, batch.coors,
                          batch.num_points, batch.mask, train=False)
    model_f = GroundEstimatorNet(cfg.replace(fused_impl="affine"))
    out_f = model_f.apply(variables, jnp.asarray(pts), train=False,
                          method=GroundEstimatorNet.fused)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_affine_pallas_kernel_matches_xla_scan_path(rng):
    """The fused pallas pass (rank+sums+matmul+max with cross-chunk carries,
    interpret mode on CPU) must produce the same canvas as the pure-XLA
    segmented-scan path, including runs spanning chunk boundaries."""
    from gndnet_tpu.ops.pillarize import affine_canvas, bin_points_batch

    # many duplicate cells + a giant run crossing several 128-row chunks
    pts_list = [make_cloud(rng, n=700)]
    big_run = np.tile(np.array([[3.5, 3.5, 0.1, 0.7]], np.float32), (340, 1))
    big_run[:, 2] += np.linspace(-0.3, 0.3, 340).astype(np.float32)
    pts = np.concatenate(pts_list + [big_run])[None]
    ctx = bin_points_batch(jnp.asarray(pts), GEOM)
    flat = jnp.asarray(pts.reshape(-1, 4))

    # with_distance=True exercises the A=5 augmented-feature row layout of
    # the slim kernel inputs (pts_t gains a |xyz| row, mmat_t a 5th column)
    for cap, with_dist in ((True, False), (False, False), (True, True)):
        d = 9 + int(with_dist)
        w = jnp.asarray(rng.normal(size=(d, 16)).astype(np.float32) * 0.3)
        b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
        ref = affine_canvas(flat, ctx, GEOM, 5, w, b, exact_point_cap=cap,
                            with_distance=with_dist, use_pallas=False)
        # chunk=128 forces the big run across multiple chunk carries; the
        # public path pads N=1040 -> 1152
        out = affine_canvas(flat, ctx, GEOM, 5, w, b, exact_point_cap=cap,
                            with_distance=with_dist,
                            use_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_affine_pallas_histogram_ends(rng, use_pallas):
    """histogram_ends == searchsorted(right)-1 per item, batched; the
    pallas in-VMEM counts kernel must match the XLA einsum exactly
    (0/1 bf16 operands, f32 accumulation — both are exact integer
    arithmetic)."""
    from gndnet_tpu.ops.pallas_affine import histogram_ends

    ny, nx, b = 8, 8, 3
    ncells = ny * nx
    cell = np.sort(rng.integers(0, ncells + 1, (b, 3000)), axis=-1
                   ).astype(np.int32)
    ends, counts = histogram_ends(jnp.asarray(cell), ny, nx,
                                  use_pallas=use_pallas,
                                  interpret=use_pallas)
    for i in range(b):
        ref_ends = np.searchsorted(cell[i], np.arange(ncells),
                                   side="right") - 1
        ref_counts = np.bincount(cell[i], minlength=ncells + 1)[:ncells]
        np.testing.assert_array_equal(np.asarray(counts)[i], ref_counts)
        occupied = ref_counts > 0
        np.testing.assert_array_equal(np.asarray(ends)[i][occupied],
                                      ref_ends[occupied])


@pytest.mark.slow
def test_affine_large_grid_uses_pallas_histogram(rng):
    """A >16384-cell geometry at B=1 routes histogram_ends through the
    in-VMEM pallas counts kernel (the fine_grid dispatch heuristic in
    affine_canvas); the canvas must still match the XLA scan path."""
    from gndnet_tpu.ops.pillarize import affine_canvas, bin_points_batch

    geom = PillarGeometry(
        pc_range=(0.0, 0.0, -4.0, 13.0, 13.0, 4.0),
        voxel_size=(0.1, 0.1, 8.0),
        grid_size=(130, 130, 1),
    )
    assert geom.ny * geom.nx > 16384
    pts = np.stack([make_cloud(rng, n=1500, lo=(-1, -1, -5),
                               hi=(14, 14, 5))])
    ctx = bin_points_batch(jnp.asarray(pts), geom)
    flat = jnp.asarray(pts.reshape(-1, 4))
    w = jnp.asarray(rng.normal(size=(9, 16)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
    ref = affine_canvas(flat, ctx, geom, 5, w, b, use_pallas=False)
    out = affine_canvas(flat, ctx, geom, 5, w, b, use_pallas=True,
                        interpret=True)
    # atol covers pallas-interpret vs XLA f32 reassociation (~2e-6 abs on
    # near-zero activations; the session-scoped rng draw varies with suite
    # ordering, so the pin must hold for any draw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_affine_canvas_f32_xla_guarded_off_on_tpu(rng, monkeypatch):
    """The f32 XLA scan path raises on the TPU backend instead of hanging
    XLA's TPU compile pipeline (docs/PARITY.md known #10); bf16 and the
    env bypass stay callable."""
    from gndnet_tpu.ops.pillarize import affine_canvas, bin_points_batch

    pts = np.stack([make_cloud(rng, n=200)])
    ctx = bin_points_batch(jnp.asarray(pts), GEOM)
    flat = jnp.asarray(pts.reshape(-1, 4))
    w = jnp.asarray(rng.normal(size=(9, 16)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("GNDNET_ALLOW_TPU_F32_XLA_SCAN", raising=False)
    with pytest.raises(ValueError, match="not supported on the TPU"):
        affine_canvas(flat, ctx, GEOM, 5, w, b, use_pallas=False)
    # bf16 compute never builds the f32 scan graph — not guarded (it still
    # EXECUTES on the real cpu backend here; only the dispatch decision
    # sees the patched name)
    out = affine_canvas(flat, ctx, GEOM, 5, w, b, use_pallas=False,
                        compute_dtype=jnp.bfloat16, precision="default")
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # explicit escape hatch for the compile-blowup probe
    monkeypatch.setenv("GNDNET_ALLOW_TPU_F32_XLA_SCAN", "1")
    out = affine_canvas(flat, ctx, GEOM, 5, w, b, use_pallas=False)
    assert np.isfinite(np.asarray(out)).all()


def test_affine_pallas_three_feature_points(rng):
    """camera-config shape: 3-feature (x, y, z) points exercise the A<4
    zero-row pad of the slim kernel inputs; pallas-interpret must match the
    XLA scan path."""
    from gndnet_tpu.ops.pillarize import affine_canvas, bin_points_batch

    pts = np.stack([make_cloud(rng, n=500)[:, :3]])
    ctx = bin_points_batch(jnp.asarray(pts), GEOM)
    flat = jnp.asarray(pts.reshape(-1, 3))
    w = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)

    ref = affine_canvas(flat, ctx, GEOM, 5, w, b, use_pallas=False)
    out = affine_canvas(flat, ctx, GEOM, 5, w, b, use_pallas=True,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_segment_broadcast_t(rng):
    """The segmented prefix-max broadcast kernel: payload at run-start rows
    reaches every row of its run, across chunk carries."""
    from gndnet_tpu.ops.pallas_affine import segment_broadcast_t

    sizes = rng.integers(1, 300, 9)
    cell = np.sort(np.concatenate(
        [np.full(s, c, np.int32) for c, s in enumerate(sizes)]))
    n = -(-cell.size // 128) * 128
    cell = np.concatenate([cell, np.full(n - cell.size, 99, np.int32)])
    starts = np.flatnonzero(np.diff(cell, prepend=-1))
    payload = rng.normal(size=(starts.size, 6)).astype(np.float32)
    vals = np.full((n, 6), -3.0e38, np.float32)
    vals[starts] = payload
    out = np.asarray(segment_broadcast_t(
        jnp.asarray(cell), jnp.asarray(vals.T), chunk=128, interpret=True))
    expect = payload[np.searchsorted(cell[starts], cell)]
    np.testing.assert_array_equal(out.T, expect)


def test_affine_pallas_small_chunks_force_carries(rng):
    """chunk=128 drives runs across many grid steps; totals and maxima at
    run ends must match numpy reductions exactly."""
    from gndnet_tpu.ops.pallas_affine import affine_segment_scan

    ncells, n, cap = 40, 1024, 7
    cell = np.sort(rng.integers(0, ncells, n)).astype(np.int32)
    pts8 = np.zeros((n, 8), np.float32)
    pts8[:, :3] = rng.normal(size=(n, 3))
    # caller-computed kept mask: rank within run < cap
    rank = np.zeros(n, np.int64)
    for c in range(ncells):
        idx = np.where(cell == c)[0]
        rank[idx] = np.arange(idx.size)
    pts8[:, 3] = (rank < cap).astype(np.float32)
    pts8[:, 4] = rng.uniform(size=n)
    mmat8 = np.zeros((8, 16), np.float32)
    for r in (0, 1, 2, 4):
        mmat8[r] = rng.normal(size=16) * 0.3

    tot, amax = affine_segment_scan(
        jnp.asarray(cell), jnp.asarray(pts8), jnp.asarray(mmat8),
        chunk=128, interpret=True)
    tot, amax = np.asarray(tot), np.asarray(amax)

    a_np = pts8 @ mmat8
    for c in range(ncells):
        idx = np.where(cell == c)[0]
        if idx.size == 0:
            continue
        end = idx[-1]
        kept = idx[:cap]
        np.testing.assert_allclose(
            tot[end, :3], pts8[kept, :3].sum(0), rtol=1e-5, atol=1e-5)
        assert tot[end, 3] == len(kept)
        np.testing.assert_allclose(
            amax[end], a_np[kept].max(0), rtol=1e-5, atol=1e-6)


def test_affine_scan_t_fori_rounds_bitexact(rng):
    """unroll_rounds=False (the f32 compile-time fix: combine rounds as an
    in-kernel fori_loop with dynamic rotates) is bit-exact vs the static
    unroll for both outputs, cap and no-cap, across chunk boundaries."""
    from gndnet_tpu.ops.pallas_affine import affine_scan_t

    n, a, c = 1024, 5, 32
    cells = np.sort(rng.integers(0, 150, n)).astype(np.int32)
    pts = rng.normal(size=(a, n)).astype(np.float32)
    valid = (rng.uniform(size=n) > 0.1).astype(np.float32)
    mmat = (rng.normal(size=(c, a)) * 0.4).astype(np.float32)
    for cap in (6, None):
        outs = {}
        for unroll in (True, False):
            tot, smax = affine_scan_t(
                jnp.asarray(cells), jnp.asarray(pts), jnp.asarray(valid),
                jnp.asarray(mmat), max_points=cap, chunk=256,
                unroll_rounds=unroll, interpret=True)
            outs[unroll] = (np.asarray(tot), np.asarray(smax))
        np.testing.assert_array_equal(outs[True][0], outs[False][0])
        np.testing.assert_array_equal(outs[True][1], outs[False][1])


def test_affine_scan_t_in_kernel_rank_and_carries(rng):
    """The transposed kernel computes the kept mask itself (valid & in-kernel
    occurrence rank < cap).  With chunk=128 == cap lookback window, long runs
    (length >> cap) span several chunks; the capped gather row
    start+min(count, cap)-1 must hold exact numpy totals/maxima, counting
    only valid rows.  Also exercises the no-cap mode (gather at run ends)."""
    from gndnet_tpu.ops.pallas_affine import affine_scan_t

    ncells, cap = 12, 7
    # heavy-duplicate stream: a few giant runs (plus invalid rows sorted
    # last like the real caller's drop segment)
    sizes = rng.integers(1, 360, ncells)
    cell = np.sort(np.concatenate(
        [np.full(s, c, np.int32) for c, s in enumerate(sizes)]))
    n_valid = cell.size
    n = -(-((n_valid + 40)) // 128) * 128
    cell = np.concatenate([cell, np.full(n - n_valid, ncells, np.int32)])
    valid = (np.arange(n) < n_valid)
    # a few mid-stream invalid rows too (valid=0 but a real cell id):
    # they must not count toward sums/counts/max nor consume rank slots
    drop = rng.choice(n_valid, 25, replace=False)
    valid[drop] = False

    pts_t = np.zeros((4, n), np.float32)
    pts_t[:3] = rng.normal(size=(3, n))
    pts_t[3] = rng.uniform(size=n)                  # reflectance row
    validf = valid.astype(np.float32)
    mmat_t = (rng.normal(size=(16, 4)) * 0.3).astype(np.float32)

    a_np = (mmat_t @ pts_t).T                       # (n, 16)

    for cap_mode in (cap, None):
        tot_t, max_t = affine_scan_t(
            jnp.asarray(cell), jnp.asarray(pts_t), jnp.asarray(validf),
            jnp.asarray(mmat_t),
            max_points=cap_mode, chunk=128, interpret=True)
        tot, amax = np.asarray(tot_t).T, np.asarray(max_t).T
        for c in range(ncells):
            idx = np.where((cell == c) & valid)[0]
            if idx.size == 0:
                continue
            run = np.where(cell == c)[0]
            if cap_mode is None:
                kept = idx
                row = run[-1]
            else:
                # the reference's counter caps by rank among VALID rows? No:
                # rank counts stream occurrences incl. invalid rows of the
                # same cell — mirror the caller: rank = position - run start
                rank = run - run[0]
                keepm = valid[run] & (rank < cap_mode)
                kept = run[keepm]
                cnt_raw = run.size
                row = run[0] + min(cnt_raw, cap_mode) - 1
            np.testing.assert_allclose(
                tot[row, :3], pts_t[:3, kept].sum(1), rtol=1e-5, atol=1e-5)
            assert tot[row, 3] == len(kept)
            np.testing.assert_allclose(
                amax[row], a_np[kept].max(0), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_affine_canvas_batched_matches_per_scan(rng):
    """A batch through affine_canvas must equal each scan run alone (the
    per-item strided cell space keeps items fully independent), on both the
    XLA and pallas paths."""
    from gndnet_tpu.ops.pillarize import affine_canvas, bin_points_batch

    pts = np.stack([make_cloud(rng, n=300) for _ in range(3)])
    w = jnp.asarray(rng.normal(size=(9, 16)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)

    for use_pallas, interp in ((False, False), (True, True)):
        ctx = bin_points_batch(jnp.asarray(pts), GEOM)
        batched = affine_canvas(
            jnp.asarray(pts.reshape(-1, 4)), ctx, GEOM, 5, w, b,
            use_pallas=use_pallas, interpret=interp)
        assert batched.shape == (3, 8, 8, 16)
        for i in range(3):
            ctx1 = bin_points_batch(jnp.asarray(pts[i:i + 1]), GEOM)
            single = affine_canvas(
                jnp.asarray(pts[i]), ctx1, GEOM, 5, w, b,
                use_pallas=use_pallas, interpret=interp)
            np.testing.assert_array_equal(np.asarray(batched[i]),
                                          np.asarray(single[0]))


def test_affine_canvas_all_invalid_and_single_point(rng):
    """Degenerate scans: all points out of range -> zero canvas; a single
    in-range point -> exactly one occupied cell, on both paths."""
    from gndnet_tpu.ops.pillarize import affine_canvas, bin_points_batch

    w = jnp.asarray(rng.normal(size=(9, 16)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)

    allbad = np.full((1, 50, 4), 100.0, np.float32)
    ctx = bin_points_batch(jnp.asarray(allbad), GEOM)
    for use_pallas in (False, True):
        canvas = affine_canvas(jnp.asarray(allbad.reshape(-1, 4)), ctx,
                               GEOM, 5, w, b, use_pallas=use_pallas,
                               interpret=use_pallas)
        assert np.all(np.asarray(canvas) == 0)

    one = np.full((1, 50, 4), 100.0, np.float32)
    one[0, 17] = [3.5, 2.5, 0.1, 0.7]
    ctx = bin_points_batch(jnp.asarray(one), GEOM)
    for use_pallas in (False, True):
        canvas = np.asarray(affine_canvas(
            jnp.asarray(one.reshape(-1, 4)), ctx, GEOM, 5, w, b,
            use_pallas=use_pallas, interpret=use_pallas))
        occ = np.nonzero(np.any(canvas[0] != 0, axis=-1))
        assert list(zip(*occ)) == [(2, 3)]   # (y, x) of the one point
