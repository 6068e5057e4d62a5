"""Inference engine, streaming server, evaluation harness, io_shim tests."""

import numpy as np
import jax.numpy as jnp
import pytest
import time

from gndnet_tpu.config import GndNetConfig
from gndnet_tpu.evaluate import (
    evaluate_frames,
    ground_truth_seg,
    seg_metrics,
)
from gndnet_tpu.infer import GroundInferenceEngine, StreamingEngine
from gndnet_tpu.io_shim import (
    CloudField,
    crop_cloud,
    elevation_grid_lines,
    numpy_to_pointcloud2,
    pointcloud2_to_numpy,
    shift_cloud,
)
from gndnet_tpu.models.gndnet import init_model
from gndnet_tpu.ops import transforms

CFG = GndNetConfig(
    pc_range=(0.0, -8.0, -4.0, 16.0, 8.0, 4.0),
    grid_range=(0.0, -8.0, 16.0, 8.0),
    voxel_size=(1.0, 1.0, 8.0),
    max_points_voxel=20,
    max_voxels=256,
    input_features=4,
    num_points=512,
    lidar_height=1.7,
    use_norm=False,
)


def plane_cloud(rng, n=400, z=-1.7):
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(0.2, 15.8, n)
    pts[:, 1] = rng.uniform(-7.8, 7.8, n)
    pts[:, 2] = z + rng.normal(0, 0.01, n)
    return pts


def test_engine_infer_shapes_and_padding(rng):
    _, variables = init_model(CFG)
    eng = GroundInferenceEngine(CFG, variables, threshold=0.08, bucket=256)
    pts = plane_cloud(rng, n=300)  # not a multiple of bucket
    elev, labels = eng.infer(pts)
    assert elev.shape == (CFG.ny, CFG.nx)
    assert labels.shape == (300,)
    assert set(np.unique(labels)) <= {-1.0, 0.0, 1.0}
    # same scan with 3 columns (xyz only) -> zero-padded feature
    elev2, labels2 = eng.infer(pts[:, :3])
    assert elev2.shape == (CFG.ny, CFG.nx)


@pytest.mark.slow
def test_engine_all_presets_smoke(rng):
    """Every shipped preset must run scan -> (elevation, labels) end-to-end
    through the serving engine (catches config-shape assumptions like a
    hardcoded 4-feature jitter/pad anywhere on the path).  Small synthetic
    scans + reduced num_points keep CPU compile time in check; the affine
    impl runs the pallas path in interpret mode here."""
    from gndnet_tpu.config import PRESETS, load_config

    for name in PRESETS:
        cfg = load_config(name).replace(num_points=512,
                                        fused_impl="affine")
        _, variables = init_model(cfg)
        eng = GroundInferenceEngine(cfg, variables, threshold=0.08,
                                    bucket=256)
        n = 300
        pts = np.zeros((n, cfg.input_features), np.float32)
        pts[:, 0] = rng.uniform(cfg.pc_range[0], cfg.pc_range[3], n)
        pts[:, 1] = rng.uniform(cfg.pc_range[1], cfg.pc_range[4], n)
        pts[:, 2] = rng.uniform(-2.0, 0.5, n)
        elev, labels = eng.infer(pts)
        assert elev.shape == (cfg.ny, cfg.nx), name
        assert labels.shape == (n,), name
        assert np.isfinite(elev).all(), name


def test_engine_transfer_variants_and_infer_many(rng):
    """int16 + feature-pruned transfer and the micro-batched infer_many
    path against the plain float engine on the same scans."""
    _, variables = init_model(CFG)
    pts = plane_cloud(rng, n=300)
    pts[:, 3] = 0.0   # zero intensity so pruning it is value-neutral

    base = GroundInferenceEngine(CFG, variables, threshold=0.08, bucket=256)
    elev0, lab0 = base.infer(pts)

    q = GroundInferenceEngine(CFG, variables, threshold=0.08, bucket=256,
                              transfer_dtype="int16", transfer_features=3)
    assert q.transfer_bytes(300) == 512 * 3 * 2      # bucket-padded, int16
    assert base.transfer_bytes(300) == 512 * 4 * 4
    elev1, lab1 = q.infer(pts)
    # 4 mm quantization moves points by <= 2 mm; on a smooth plane the
    # elevation map moves by the same order
    np.testing.assert_allclose(elev1, elev0, atol=5e-2)
    assert np.mean(lab1 == lab0) > 0.98

    # infer_many: one stacked dispatch == per-scan results, bit-identical
    scans = [plane_cloud(rng, n=300) for _ in range(3)]
    many = q.infer_many(scans)
    for scan, (elev_m, lab_m) in zip(scans, many):
        elev_s, lab_s = q.infer(scan)
        np.testing.assert_array_equal(lab_m, lab_s)
        np.testing.assert_allclose(elev_m, elev_s, atol=1e-6)

    with pytest.raises(ValueError):
        GroundInferenceEngine(CFG, variables, transfer_features=2)
    with pytest.raises(ValueError):
        q.infer_many([plane_cloud(rng, n=300), plane_cloud(rng, n=600)])

    # warmup must slice to transfer_features too (it once shipped the full
    # input_features width, which double-padded on device and crashed the
    # feature-pruned streaming path — caught by bench --mode stream
    # --features 3)
    assert q.warmup(n=300) >= 0.0


def test_engine_segments_obstacles_from_plane(rng):
    """With a zero elevation prediction the engine must mark high points as
    obstacles; use an untrained model but check label consistency against the
    engine's own elevation output."""
    _, variables = init_model(CFG)
    eng = GroundInferenceEngine(CFG, variables, threshold=0.2, bucket=256)
    pts = plane_cloud(rng, n=200)
    pts[:50, 2] = 3.0  # tall obstacles
    elev, labels = eng.infer(pts)
    shifted = pts.copy()
    shifted[:, 2] += CFG.lidar_height
    ix = np.floor(shifted[:, 0] - CFG.grid_range[0]).astype(int)
    iy = np.floor(shifted[:, 1] - CFG.grid_range[1]).astype(int)
    inside = (ix > 0) & (ix < 16) & (iy > 0) & (iy < 16)
    want = np.where(
        inside, (shifted[:, 2] > elev.T[np.clip(ix, 0, 15),
                                        np.clip(iy, 0, 15)] + 0.2), -1)
    want = np.where(inside, want.astype(float), -1.0)
    np.testing.assert_array_equal(labels, want)


def test_streaming_engine_latest_value(rng):
    _, variables = init_model(CFG)
    eng = GroundInferenceEngine(CFG, variables, bucket=256)
    srv = StreamingEngine(eng, warmup=True).start()
    try:
        assert srv.latest() is None or srv.latest()[0] == 0
        pts = plane_cloud(rng)
        last_seq = 0
        for _ in range(5):
            last_seq = srv.submit(pts)
        deadline = time.time() + 10
        while time.time() < deadline:
            out = srv.latest()
            if out is not None and out[0] == last_seq:
                break
            time.sleep(0.01)
        out = srv.latest()
        assert out is not None and out[0] == last_seq
        assert srv.errors == 0
        # the mailbox drops stale frames: processed <= submitted
        assert srv.processed <= 5
    finally:
        srv.stop()


def test_evaluate_frames_perfect_prediction_is_high_iou(rng):
    """A constructed scene where ground truth and geometry agree: flat ground
    at z=-lidar_height with labeled obstacles above.  An untrained model won't
    match, so instead check the metric plumbing with a rigged engine by
    evaluating a scene whose GT is derived from the same thresholding."""
    _, variables = init_model(CFG)
    cloud = plane_cloud(rng, n=500, z=-CFG.lidar_height)
    cloud[:100, 2] = 2.0
    labels = np.full(500, 40, np.uint32)   # ground class
    labels[:100] = 10                      # car -> obstacle
    labels[490:] = 0                       # unlabeled -> excluded
    res = evaluate_frames(CFG, variables, [(cloud[:, :3], labels)],
                          threshold=0.0)
    assert res.frames == 1
    assert 0.0 <= res.iou <= 1.0
    assert res.mse >= 0.0
    d = res.as_dict()
    assert set(d) == {"frames", "iou", "precision", "recall", "mse"}


def test_evaluate_frames_matches_reference_oracle():
    """The WHOLE eval pipeline — engine prediction -> threshold segmentation
    -> get_GndSeg -> outlier removal -> IoU/precision/recall -> occupancy
    mask + eval-variant heightmap -> masked MSE — pinned against a
    sequential numpy re-derivation of reference
    evaluate_SemanticKITTI.py:94-235 at reference_compat=True, on a
    synthetic labeled scene with out-of-grid points, unlabeled points, and
    obstacle/ground mix."""
    from oracles import eval_frame_oracle

    rng = np.random.default_rng(3)
    _, variables = init_model(CFG)
    n = 600
    cloud = np.zeros((n, 3), np.float32)
    cloud[:, 0] = rng.uniform(-1.0, 17.0, n)    # includes out-of-grid x
    cloud[:, 1] = rng.uniform(-9.0, 9.0, n)     # includes out-of-grid y
    cloud[:, 2] = rng.uniform(-2.2, -1.2, n)    # near-ground band
    cloud[:150, 2] = rng.uniform(0.0, 2.0, 150)  # obstacles
    sem = rng.choice(
        np.array([40, 44, 48, 72, 10, 30, 0, 1], np.uint32), n)

    res = evaluate_frames(CFG, variables, [(cloud, sem)], threshold=0.0,
                          reference_compat=True)

    # same engine configuration evaluate_frames builds -> bit-identical pred
    engine = GroundInferenceEngine(CFG, variables, threshold=0.0,
                                   shift_cloud=True)
    pred, _ = engine.infer(cloud)
    iou, prec, rec, mse = eval_frame_oracle(
        pred, cloud, sem, CFG.grid_range, CFG.voxel_size[0],
        CFG.lidar_height, threshold=0.0)
    assert res.iou == pytest.approx(iou, abs=1e-9)
    assert res.precision == pytest.approx(prec, abs=1e-9)
    assert res.recall == pytest.approx(rec, abs=1e-9)
    assert res.mse == pytest.approx(mse, rel=1e-6)
    # sanity: the scene actually exercises every label bucket
    assert (np.unique(sem) >= 0).all() and res.mse > 0


def test_seg_metrics_golden():
    pred = np.array([0, 0, 1, 1, -1, 0], np.float32)
    gt = np.array([0, 1, 1, 0, 0, -1], np.float32)
    iou, prec, rec = seg_metrics(pred, gt)
    # valid rows: 0..3; ground(pred)=[1,1,0,0], ground(gt)=[1,0,0,1]
    assert iou == pytest.approx(1 / 3)
    assert prec == pytest.approx(1 / 2)
    assert rec == pytest.approx(1 / 2)


def test_ground_truth_seg_classes():
    lab = np.array([40, 44, 48, 49, 60, 72, 10, 0, 1], np.uint32)
    seg = ground_truth_seg(lab)
    np.testing.assert_array_equal(seg[:6], 0.0)
    assert seg[6] == 1.0
    np.testing.assert_array_equal(seg[7:], -1.0)


# ---------------------------------------------------------------------------
# io_shim
# ---------------------------------------------------------------------------

def test_pointcloud2_roundtrip(rng):
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    intensity = rng.uniform(size=50).astype(np.float32)
    labels = np.array([1.0, 0.0, -1.0] * 16 + [1.0, 0.0], np.float32)
    enc = numpy_to_pointcloud2(xyz, intensity=intensity, rgb_labels=labels)
    dec = pointcloud2_to_numpy(enc["data"], enc["point_step"], enc["fields"])
    np.testing.assert_allclose(dec["xyz"], xyz)
    np.testing.assert_allclose(dec["intensity"], intensity)
    assert dec["rgb"].shape == (50, 3)


def test_shift_and_crop():
    c = np.array([[0.0, 0.0, 0.0, 9.0], [3.0, 3.0, 1.0, 9.0],
                  [30.0, 0.0, 0.0, 9.0]], np.float32)
    shift_cloud(c, 1.7)
    np.testing.assert_allclose(c[:, 2], [1.7, 2.7, 1.7])
    kept = crop_cloud(c, (-1, -1, 10, 10))
    assert kept.shape[0] == 2


def test_elevation_grid_lines():
    elev = np.arange(64, dtype=np.float32).reshape(8, 8)
    segs = elevation_grid_lines(elev, CFG, decimate=4)
    assert segs.ndim == 3 and segs.shape[1:] == (2, 3)
    assert segs.shape[0] == 4  # 2x2 nodes -> 2 x-links + 2 y-links
    # endpoints are in world coords
    assert segs[:, :, 0].min() >= CFG.grid_range[0]


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def test_quaternion_euler_roundtrip(rng):
    for _ in range(10):
        rpy = rng.uniform(-1.2, 1.2, 3)
        q = transforms.quaternion_from_euler(*rpy)
        back = transforms.euler_from_quaternion(*q)
        np.testing.assert_allclose(back, rpy, atol=1e-9)


def test_transform_cloud_matches_scipy(rng):
    from scipy.spatial.transform import Rotation as R

    q = R.from_euler("zyx", [30, 10, -5], degrees=True).as_quat()  # xyzw
    rot = transforms.quaternion_rotation_matrix(q)
    np.testing.assert_allclose(rot, R.from_quat(q).as_matrix(), atol=1e-12)

    m = transforms.transformation_matrix([1.0, -2.0, 0.5], rot)
    pts = rng.normal(size=(20, 4)).astype(np.float64)
    out = transforms.transform_cloud(pts, m)
    want = pts[:, :3] @ rot.T + np.array([1.0, -2.0, 0.5])
    np.testing.assert_allclose(out[:, :3], want, atol=1e-12)
    np.testing.assert_allclose(out[:, 3], pts[:, 3])  # extra col untouched


def test_int16_transfer_matches_float32():
    """4 mm fixed-point transfer: identical segmentation, elevation within
    quantization tolerance.  Uses a LOCAL rng (not the session fixture) so
    the comparison input is order-independent: the <=2 mm input quantization
    gets amplified through the untrained conv stack, so the elevation
    tolerance is empirical and input-specific."""
    rng = np.random.default_rng(7)
    _, variables = init_model(CFG)
    e32 = GroundInferenceEngine(CFG, variables, threshold=0.2, bucket=256)
    e16 = GroundInferenceEngine(CFG, variables, threshold=0.2, bucket=256,
                                transfer_dtype="int16")
    pts = plane_cloud(rng, n=300)
    pts[:40, 2] = 2.5
    elev32, lab32 = e32.infer(pts)
    elev16, lab16 = e16.infer(pts)
    np.testing.assert_allclose(elev16, elev32, atol=0.06)
    assert (lab16 == lab32).mean() > 0.995  # ties at the threshold only

    with pytest.raises(ValueError, match="transfer_dtype"):
        GroundInferenceEngine(CFG, variables, transfer_dtype="int8")


def test_profiling_utils(rng, tmp_path):
    import jax.numpy as jnp

    from gndnet_tpu.utils.profiling import StageTimer, measure_hz

    t = StageTimer()
    with t("a"):
        pass
    with t("a"):
        pass
    with t("b"):
        pass
    rep = t.report()
    assert "a:" in rep and "over 2" in rep

    hz = measure_hz(lambda x: x * 2.0,
                    lambda: (jnp.ones((64, 64)),), units_per_call=4, reps=2)
    assert hz > 0
