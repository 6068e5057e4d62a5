"""Native C++ host runtime tests (vs numpy oracles and the jax ops)."""

import threading

import numpy as np
import jax.numpy as jnp
import pytest

from gndnet_tpu import native
from oracles import segment_cloud_oracle, voxelize_oracle

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")

VOXEL = (1.0, 1.0, 8.0)
RANGE = (0.0, 0.0, -4.0, 8.0, 8.0, 4.0)


def cloud(rng, n=800):
    pts = rng.uniform(size=(n, 4)).astype(np.float32)
    pts[:, 0] = pts[:, 0] * 10 - 1
    pts[:, 1] = pts[:, 1] * 10 - 1
    pts[:, 2] = pts[:, 2] * 10 - 5
    return pts


@pytest.mark.parametrize("max_points,max_voxels,brk", [
    (5, 64, True), (5, 8, True), (3, 8, False), (10, 128, True)])
def test_native_voxelize_matches_oracle(rng, max_points, max_voxels, brk):
    pts = cloud(rng)
    want = voxelize_oracle(pts, VOXEL, RANGE, max_points, max_voxels,
                           reference_break=brk)
    got = native.voxelize(pts, VOXEL, RANGE, max_points, max_voxels,
                          reference_break=brk)
    assert got[0].shape == want[0].shape
    np.testing.assert_array_equal(got[1], want[1])
    np.testing.assert_array_equal(got[2], want[2])
    np.testing.assert_allclose(got[0], want[0])


def test_native_voxelize_matches_tpu_pillarize(rng):
    """Capacity never exceeded -> native (reference semantics) == jax path."""
    from gndnet_tpu.ops.pillarize import PillarGeometry, pillarize

    pts = cloud(rng, 500)
    geom = PillarGeometry(RANGE, VOXEL, (8, 8, 1))
    nv, nc, nn = native.voxelize(pts, VOXEL, RANGE, 10, 128)
    jb = pillarize(jnp.asarray(pts), geom, 10, 128)
    n = int(jb.n_pillars)
    assert n == nv.shape[0]
    np.testing.assert_array_equal(np.asarray(jb.coors)[:n], nc)
    np.testing.assert_allclose(np.asarray(jb.voxels)[:n], nv)


def test_native_segment_cloud(rng):
    pts = cloud(rng, 300)[:, :3]
    elev = rng.normal(0, 0.5, (8, 8)).astype(np.float32)
    want = segment_cloud_oracle(
        pts.astype(np.float64), (0.0, 0.0, 8.0, 8.0), 1.0, elev, 0.2)
    got = native.segment_cloud_host(pts, (0.0, 0.0, 8.0, 8.0), 1.0, elev, 0.2)
    np.testing.assert_array_equal(got, want)


def test_native_shift_and_transform(rng):
    pts = cloud(rng, 50)
    ref = pts.copy()
    native.shift_cloud_host(pts, 1.5)
    np.testing.assert_allclose(pts[:, 2], ref[:, 2] + 1.5, rtol=1e-6)

    from gndnet_tpu.ops.transforms import (
        quaternion_from_euler,
        quaternion_rotation_matrix,
        transformation_matrix,
    )

    m = transformation_matrix(
        [1.0, -2.0, 0.5],
        quaternion_rotation_matrix(quaternion_from_euler(0.2, -0.1, 0.7)))
    a = pts.copy()
    native.transform_cloud_host(a, m)
    want = pts[:, :3] @ m[:3, :3].T + m[:3, 3]
    np.testing.assert_allclose(a[:, :3], want, atol=1e-5)
    np.testing.assert_allclose(a[:, 3], pts[:, 3])


def test_mailbox_basic():
    mb = native.NativeMailbox(1024)
    out = np.zeros(1024, np.uint8)
    n, seq = mb.read_latest(out)
    assert n == 0
    payload = np.arange(100, dtype=np.float32)
    s1 = mb.write(payload)
    n, seq = mb.read_latest(out)
    assert n == 400 and seq == s1
    np.testing.assert_array_equal(out[:400].view(np.float32), payload)
    # nothing new
    n, _ = mb.read_latest(out)
    assert n == 0
    # drop-old: two writes, reader sees only the newest
    mb.write(payload)
    s3 = mb.write(payload * 2)
    n, seq = mb.read_latest(out)
    assert seq == s3
    np.testing.assert_array_equal(out[:400].view(np.float32), payload * 2)
    # oversized payload -> clean error
    with pytest.raises(ValueError, match="exceeds capacity"):
        mb.write(np.zeros(2048, np.uint8))
    mb.close()


def test_mailbox_concurrent_stress():
    """Writer floods, reader samples: every read must be internally
    consistent (all elements equal to its seq) and seqs monotonic."""
    mb = native.NativeMailbox(4096)
    n_msgs = 20000
    errors = []

    def writer():
        for i in range(1, n_msgs + 1):
            mb.write(np.full(1024, i, np.int32))

    seen = []

    def reader():
        out = np.zeros(4096, np.uint8)
        last = 0
        while last < n_msgs:
            n, seq = mb.read_latest(out)
            if n == 0:
                continue
            vals = out[:n].view(np.int32)
            if not np.all(vals == vals[0]):
                errors.append(("torn read", seq))
                return
            if vals[0] <= last and len(seen) > 0:
                errors.append(("non-monotonic", vals[0], last))
                return
            last = int(vals[0])
            seen.append(last)

    t = threading.Thread(target=reader)
    t.start()
    writer()
    t.join(timeout=30)
    assert not errors, errors[:3]
    assert seen[-1] == n_msgs
    assert all(b > a for a, b in zip(seen, seen[1:]))
    mb.close()
