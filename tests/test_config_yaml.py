"""Every reference YAML loads verbatim and its geometry actually runs.

Pins docs/MIGRATION.md's claim (reference config/*.yaml load unchanged via
GndNetConfig.from_yaml) for ALL seven shipped reference configs — including
the three the rest of the suite never exercises: config.yaml (60x60 FOV
grid), config_kittiBag.yaml (pc_range x-origin offset 0.6 m from
grid_range), config_open3dExample.yaml (non-square 106x100 grid,
lidar_height 3.9).  Reference: /root/reference/config/*.yaml, consumed by
the reference via attrdict (train.py:33-40).
"""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gndnet_tpu.config import (GndNetConfig, camera_config,
                               custom_local_config, kitti_sem_config)
from gndnet_tpu.ops import pillarize as pz

REF_CFG_DIR = "/root/reference/config"
ALL_YAMLS = sorted(glob.glob(os.path.join(REF_CFG_DIR, "*.yaml")))


@pytest.fixture(params=ALL_YAMLS, ids=[os.path.basename(p) for p in ALL_YAMLS])
def ref_yaml(request):
    return request.param


def test_reference_yaml_loads_and_derives_geometry(ref_yaml):
    cfg = GndNetConfig.from_yaml(ref_yaml)
    geom = pz.PillarGeometry.from_config(cfg)
    # every reference preset: 1 voxel layer in z, positive integral grid
    assert geom.nx > 0 and geom.ny > 0 and geom.nz == 1
    sx = (cfg.pc_range[3] - cfg.pc_range[0]) / cfg.voxel_size[0]
    sy = (cfg.pc_range[4] - cfg.pc_range[1]) / cfg.voxel_size[1]
    assert geom.nx == round(sx) and geom.ny == round(sy)
    assert cfg.input_features in (3, 4)
    assert cfg.max_points_voxel > 0 and cfg.max_voxels > 0
    assert cfg.vfe_filters == (64,)


@pytest.mark.parametrize("yaml_name,preset", [
    ("config_kittiSem.yaml", kitti_sem_config),
    ("config_camera.yaml", camera_config),
    ("config_custom_local.yaml", custom_local_config),
])
def test_preset_matches_reference_yaml(yaml_name, preset):
    got = GndNetConfig.from_yaml(os.path.join(REF_CFG_DIR, yaml_name))
    want = preset()
    for f in ("grid_range", "pc_range", "voxel_size", "max_points_voxel",
              "max_voxels", "input_features", "num_points", "use_norm",
              "with_distance", "shift_cloud", "lidar_height", "lr",
              "momentum", "weight_decay", "alpha", "beta"):
        assert getattr(got, f) == getattr(want, f), (yaml_name, f)


def _synthetic_scan(cfg, n=512, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.asarray(cfg.pc_range[:3], np.float32)
    hi = np.asarray(cfg.pc_range[3:], np.float32)
    pts = np.empty((n, 4), np.float32)
    pts[:, :3] = rng.uniform(lo + 0.01, hi - 0.01, size=(n, 3))
    pts[:, 3] = rng.uniform(0, 1, size=n)
    # 3-feature configs (camera/custom) consume (N, 3) xyz clouds — same
    # column convention as bench.load_scan (pts[:, :cfg.input_features])
    return pts[:, :cfg.input_features]


def test_reference_yaml_geometry_pillarizes(ref_yaml):
    """The three never-exercised geometries (offset pc_range, non-square
    grid, 60x60 FOV) actually run through the jitted voxelizer."""
    cfg = GndNetConfig.from_yaml(ref_yaml)
    geom = pz.PillarGeometry.from_config(cfg)
    pts = _synthetic_scan(cfg)
    out = jax.jit(lambda p: pz.pillarize(
        p, geom, cfg.max_points_voxel, min(cfg.max_voxels, 1024)))(
            jnp.asarray(pts))
    coors = np.asarray(out.coors)
    npil = int(np.asarray(out.n_pillars))
    assert npil > 0
    live = coors[:npil]
    assert (live[:, 2] >= 0).all() and (live[:, 2] < geom.nx).all()
    assert (live[:, 1] >= 0).all() and (live[:, 1] < geom.ny).all()
    assert int(np.asarray(out.num_points)[:npil].sum()) <= len(pts)


@pytest.mark.slow
@pytest.mark.parametrize("yaml_name", ["config_kittiBag.yaml",
                                       "config_open3dExample.yaml"])
def test_unexercised_yaml_full_forward(yaml_name):
    """Full fused forward at the two geometries no preset covers: kittiBag's
    shifted pc_range origin and open3dExample's non-square 106x100 grid
    (odd pooled dims: 53 -> 26 floor, torch-style)."""
    from gndnet_tpu.models.gndnet import GroundEstimatorNet, init_model

    cfg = GndNetConfig.from_yaml(os.path.join(REF_CFG_DIR, yaml_name))
    cfg = cfg.replace(num_points=2048, max_voxels=1024)
    model, variables = init_model(cfg)
    pts = _synthetic_scan(cfg, n=2048, seed=1)
    elev = jax.jit(lambda v, p: model.apply(
        v, p, train=False, method=GroundEstimatorNet.fused))(
            variables, jnp.asarray(pts)[None])
    geom = pz.PillarGeometry.from_config(cfg)
    assert elev.shape == (1, geom.ny, geom.nx)
    assert np.isfinite(np.asarray(elev)).all()
