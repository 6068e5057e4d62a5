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
