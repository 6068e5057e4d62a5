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


def load_cloud(path: str, num_features: int, lidar_height: float,
               shift_cloud: bool) -> np.ndarray:
    """Reference input semantics (predict_ground.py:124-135): .npy files are
    generated reduced_velo data stored already shifted by lidar_height, so
    they are pre-UN-shifted here (the engine re-adds it); .bin raw scans pass
    through; missing feature columns are padded with ones."""
    if path.endswith(".bin"):
        pts = np.fromfile(path, np.float32).reshape(-1, 4)
    else:
        pts = np.load(path).astype(np.float32)
        if shift_cloud:
            pts[:, 2] -= lidar_height
    if pts.shape[1] < num_features:
        pts = np.concatenate(
            [pts, np.ones((len(pts), num_features - pts.shape[1]),
                          np.float32)], 1)
    return pts[:, :num_features]


def save_visualization(path, cfg, cloud, elevation, labels):
    """Matplotlib stand-in for the reference's rviz view (predict_ground.py
    -v: segmented cloud + elevation marker grid)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(14, 6))
    im = axes[0].imshow(elevation, origin="lower",
                        extent=(cfg.pc_range[0], cfg.pc_range[3],
                                cfg.pc_range[1], cfg.pc_range[4]))
    axes[0].set_title("predicted ground elevation")
    fig.colorbar(im, ax=axes[0], shrink=0.8)

    colors = {1: "tab:red", 0: "tab:green", -1: "tab:gray"}
    names = {1: "obstacle", 0: "ground", -1: "outside"}
    step = max(1, len(cloud) // 40000)
    for lab in (0, 1, -1):
        m = labels[::step] == lab
        axes[1].scatter(cloud[::step][m, 0], cloud[::step][m, 1], s=0.3,
                        c=colors[lab], label=names[lab])
    axes[1].set_title("per-point segmentation (top view)")
    axes[1].set_aspect("equal")
    axes[1].legend(markerscale=20)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


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
    p.add_argument("--viz", default="", help="save a PNG visualization "
                   "(elevation map + segmented scatter) to this path")
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
    cloud = load_cloud(args.pcl, cfg.input_features, cfg.lidar_height,
                       cfg.shift_cloud)
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
    if args.viz:
        save_visualization(args.viz, cfg, cloud, elevation, labels)
        print(f"saved {args.viz}")


if __name__ == "__main__":
    main()
