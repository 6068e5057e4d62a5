"""Postproc op tests vs sequential oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from gndnet_tpu.ops.postproc import (
    compact_obstacles,
    filter_points_by_frustum,
    lidar_to_heightmap,
    lidar_to_img,
    remove_outliers,
    segment_cloud,
    segment_cloud_masked,
)
from oracles import segment_cloud_oracle

GRID = (-8.0, -8.0, 8.0, 8.0)
CELL = 1.0


def cloud(rng, n=300):
    pts = rng.uniform(-9, 9, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 2, size=n)
    return pts


def test_segment_cloud_matches_oracle(rng):
    pts = cloud(rng)
    elev = rng.normal(0, 0.5, size=(16, 16)).astype(np.float32)
    want = segment_cloud_oracle(pts.astype(np.float64), GRID, CELL, elev, 0.2)
    got = np.asarray(segment_cloud(jnp.asarray(pts), GRID, CELL,
                                   jnp.asarray(elev), 0.2))
    np.testing.assert_array_equal(got, want)
    # the quirky 0 < idx bound: points in cell row/col 0 are out-of-grid
    edge = np.array([[-7.5, 0.0, 10.0]], np.float32)  # ix == 0
    lab = np.asarray(segment_cloud(jnp.asarray(edge), GRID, CELL,
                                   jnp.asarray(elev), 0.2))
    assert lab[0] == -1.0


def test_compact_obstacles(rng):
    pts = cloud(rng, 50)
    elev = np.zeros((16, 16), np.float32)
    labels, mask = segment_cloud_masked(jnp.asarray(pts), GRID, CELL,
                                        jnp.asarray(elev), 0.0)
    compacted, count = compact_obstacles(jnp.asarray(pts), mask)
    count = int(count)
    assert count == int(np.sum(np.asarray(mask)))
    want = pts[np.asarray(mask)]
    np.testing.assert_allclose(np.asarray(compacted)[:count], want)
    assert np.all(np.asarray(compacted)[count:] == 0)


def test_lidar_to_img_golden():
    pts = np.array([
        [1.5, 2.5, 0.0],     # cell (9, 10) after offset by (-8,-8)
        [-7.5, -7.5, 0.0],   # cell (0, 0) -> excluded by 0 < idx
        [1.5, 2.5, 20.0],    # z >= 10 -> excluded
    ], np.float32)
    img = np.asarray(lidar_to_img(jnp.asarray(pts), GRID, CELL, fill=1.0))
    assert img.shape == (16, 16)
    assert img[9, 10] == 1.0
    assert img.sum() == 1.0


def test_heightmap_variants():
    # 3 points in one cell, max_points=2 -> keeps first two in stream order
    pts = np.array([
        [0.5, 0.5, 1.0],
        [0.6, 0.6, 2.0],
        [0.7, 0.7, 9.0],
    ], np.float32)
    hm, cnt = lidar_to_heightmap(jnp.asarray(pts), GRID, CELL, max_points=2)
    hm, cnt = np.asarray(hm), np.asarray(cnt)
    assert cnt[8, 8] == 2
    assert hm[8, 8] == pytest.approx(1.5)       # (1+2)/2, third point dropped
    # reference-eval-bug variant: divisor = count + 1
    hm2, _ = lidar_to_heightmap(jnp.asarray(pts), GRID, CELL, max_points=2,
                                reference_eval_bug=True)
    assert np.asarray(hm2)[8, 8] == pytest.approx(3.0 / 3.0)
    # empty cells are 0 in both
    assert hm[3, 3] == 0 and np.asarray(hm2)[3, 3] == 0


def test_heightmap_bounds_difference():
    p0 = np.array([[-7.5, -7.5, 1.0]], np.float32)  # cell (0,0)
    hm, cnt = lidar_to_heightmap(jnp.asarray(p0), GRID, CELL)
    assert np.asarray(cnt)[0, 0] == 1               # corrected: 0 <= idx kept
    hm2, cnt2 = lidar_to_heightmap(jnp.asarray(p0), GRID, CELL,
                                   reference_eval_bug=True)
    assert np.asarray(cnt2)[0, 0] == 0              # eval variant: 0 < idx


def test_remove_outliers():
    pred = jnp.asarray(np.array([1.0, 0.0, -1.0, 0.0], np.float32))
    gt = jnp.asarray(np.array([0.0, 0.0, 0.0, -1.0], np.float32))
    p, g, valid = remove_outliers(pred, gt)
    np.testing.assert_array_equal(np.asarray(valid), [True, True, False, False])
    np.testing.assert_array_equal(np.asarray(p), [0.0, 1.0, 0.0, 0.0])
    np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0, 0.0, 0.0])


def test_frustum_culling_basic():
    pos = np.zeros(3, np.float32)
    fwd = np.array([1.0, 0.0, 0.0], np.float32)
    pts = np.array([
        [5.0, 0.0, 0.0],    # straight ahead -> in
        [-5.0, 0.0, 0.0],   # behind -> out
        [5.0, 40.0, 0.0],   # far off axis -> out
        [0.05, 0.0, 0.0],   # before near plane -> out
        [20.0, 0.0, 0.0],   # past far plane -> out
    ], np.float32)
    mask = np.asarray(filter_points_by_frustum(
        jnp.asarray(pts), pos, fwd, fov=90.0, aspect_ratio=1.0,
        near=0.1, far=10.0))
    np.testing.assert_array_equal(mask, [True, False, False, False, False])


def test_frustum_culling_matches_sequential(rng):
    """Vectorized plane test vs a direct per-point reimplementation of the
    reference's dot-product loop (frustrum_culling.py:79-102)."""
    from gndnet_tpu.ops.postproc import frustum_planes

    pos = np.array([0.0, 0.0, 0.0], np.float32)
    fwd = np.array([1.0, 0.2, 0.0], np.float32)
    pts = rng.uniform(-12, 12, size=(200, 3)).astype(np.float32)
    origins, normals = frustum_planes(pos, fwd, 115.0, 0.1, 10.0, 16 / 9)
    want = np.array([
        all(np.dot(p - o, n) >= 0 for o, n in zip(origins, normals))
        for p in pts
    ])
    got = np.asarray(filter_points_by_frustum(
        jnp.asarray(pts), pos, fwd, 115.0, 16 / 9, 0.1, 10.0))
    np.testing.assert_array_equal(got, want)
    assert 0 < want.sum() < len(pts)
