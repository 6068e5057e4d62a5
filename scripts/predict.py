#!/usr/bin/env python
"""Single-scan inference CLI.

Counterpart of the reference's predict_ground.py (reference:
predict_ground.py:51-62): load a cloud (.npy or KITTI .bin), run the
compiled engine, print stats, optionally save the elevation map and
segmentation.

Example:
  python scripts/predict.py --config kitti_sem --pcl scan.npy \
      --resume checkpoint.pth.tar --out out_prefix
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_cloud(path: str, num_features: int) -> np.ndarray:
    if path.endswith(".bin"):
        pts = np.fromfile(path, np.float32).reshape(-1, 4)
    else:
        pts = np.load(path).astype(np.float32)
    if pts.shape[1] < num_features:
        pts = np.concatenate(
            [pts, np.zeros((len(pts), num_features - pts.shape[1]),
                           np.float32)], 1)
    return pts[:, :num_features]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="kitti_sem")
    p.add_argument("--pcl", required=True, help=".npy or KITTI .bin cloud")
    p.add_argument("--resume", default="", help="checkpoint: .pth.tar "
                   "(reference format) or an orbax checkpoint dir")
    p.add_argument("--threshold", type=float, default=0.08,
                   help="segmentation threshold (reference default 0.08)")
    p.add_argument("--out", default="", help="save <out>_elevation.npy and "
                   "<out>_segmentation.npy")
    args = p.parse_args()

    from gndnet_tpu.config import load_config
    from gndnet_tpu.infer import GroundInferenceEngine
    from gndnet_tpu.models.gndnet import init_model

    cfg = load_config(args.config)
    model, variables = init_model(cfg)
    if args.resume:
        if args.resume.endswith(".pth.tar") or args.resume.endswith(".pth"):
            from gndnet_tpu.checkpoint import load_torch_checkpoint

            variables = load_torch_checkpoint(args.resume, cfg)["variables"]
        else:
            from gndnet_tpu.checkpoint import CheckpointManager

            mgr = CheckpointManager(args.resume)
            restored = mgr.restore()
            state = restored["state"]
            variables = {"params": state["params"],
                         "batch_stats": state["batch_stats"]}

    engine = GroundInferenceEngine(cfg, variables, threshold=args.threshold)
    cloud = load_cloud(args.pcl, cfg.input_features)
    elevation, labels = engine.infer(cloud)
    n_gnd = int((labels == 0).sum())
    n_obs = int((labels == 1).sum())
    n_out = int((labels == -1).sum())
    print(f"points: {len(cloud)}  ground: {n_gnd}  obstacle: {n_obs}  "
          f"outside: {n_out}")
    print(f"elevation: shape {elevation.shape}  "
          f"range [{elevation.min():.3f}, {elevation.max():.3f}]")
    if args.out:
        np.save(args.out + "_elevation.npy", elevation)
        np.save(args.out + "_segmentation.npy", labels)
        print(f"saved {args.out}_elevation.npy / _segmentation.npy")


if __name__ == "__main__":
    main()
