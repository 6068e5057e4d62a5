"""Why is UNTRAINED fixture IoU already ~0.755?  (VERDICT r4 item 6.)

bench.py --mode accuracy reports segmentation IoU of the model's
thresholded labels against a GT segmentation derived from the fixture's
ground-truth elevation grid (the fixture ships no per-point semantic
labels).  The untrained model already scores ~0.755 IoU, and the judge
asked what the elevation PRIOR contributes vs the net.  This probe
scores a ladder of elevation predictors on the holdout frame so the
gap each ingredient closes is explicit:

  all-ground      every valid point labeled ground — the class-prior
                  floor (IoU = ground fraction of the holdout cloud)
  zero grid       constant elevation 0 (sensor height datum)
  const mean      constant at the TRAIN frames' mean GT elevation
  train-mean map  per-cell mean of the 4 train frames' GT grids (the
                  best "memorize the prior" predictor with no net)
  untrained net   seeded init, no training (the accuracy gate's before)
  gt grid         the holdout GT grid itself (ceiling: IoU 1 by
                  construction at the same threshold)

Reading the result: KITTI ground sits near a smooth plane at z ~ -1.7 m
below the sensor, so any grid near that plane separates most points;
the *train-mean map* row is the honest "prior only" number, and the
trained-vs-untrained delta on top of it is what learning buys on this
5-frame fixture.  The fixture ceiling is NOT 1.0 in practice: pred and
GT segmentations disagree wherever a point's cell height sits within
+-threshold of the boundary, so RMSE ~0.13 m against a 0.08 m threshold
caps IoU well below 1 — the trained row together with the gt-grid row
brackets that ceiling.

Run on CPU (no TPU needed): python scripts/probe_fixture_iou.py
"""

import sys

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

from bench import load_fixture_frames  # noqa: E402
from gndnet_tpu.config import load_config  # noqa: E402
from gndnet_tpu.evaluate import seg_metrics  # noqa: E402
from gndnet_tpu.models.gndnet import GroundEstimatorNet, init_model  # noqa: E402
from gndnet_tpu.ops.postproc import segment_cloud  # noqa: E402


def main(holdout: int = 4, thresholds=(0.0, 0.08, 0.16)) -> None:
    cfg = load_config("kitti_sem")
    frames = load_fixture_frames(cfg)
    if frames is None:
        print("fixture unavailable"); return
    clouds, labels = frames
    tr_idx = [i for i in range(len(clouds)) if i != holdout]
    cloud = np.asarray(clouds[holdout][:, :3])
    gt = labels[holdout]
    cell = float(cfg.voxel_size[0])

    def seg(elev, thr):
        return np.asarray(segment_cloud(cloud, cfg.grid_range, cell,
                                        np.asarray(elev, np.float32).T,
                                        threshold=thr))

    model, variables = init_model(cfg, seed=0)

    def untrained(pts):
        return np.asarray(model.apply(
            variables, pts[None], train=False,
            method=GroundEstimatorNet.fused)[0])

    rng = np.random.default_rng(0)
    preds = {
        "zero grid": np.zeros_like(gt),
        "const mean": np.full_like(gt, labels[tr_idx].mean()),
        "train-mean map": labels[tr_idx].mean(axis=0),
        "untrained net": untrained(clouds[holdout]),
        # the IoU ceiling AT the trained model's accuracy: the GT grid
        # perturbed by iid noise at the accuracy gate's holdout RMSE —
        # what a perfectly unbiased model with that error level scores
        "gt + N(0, 0.137)": gt + rng.normal(0.0, 0.137, gt.shape)
                                    .astype(np.float32),
        "gt grid": gt,
    }

    for thr in thresholds:
        gt_seg = seg(gt, thr)
        valid = gt_seg >= 0
        ground_frac = float((gt_seg[valid] == 0).mean())
        print(f"\n== threshold {thr:g}  (ground fraction "
              f"{ground_frac:.3f} of {int(valid.sum())} valid pts) ==")
        # the class-prior floor: label every valid point ground
        all_g = np.where(valid, 0, -1)
        iou, p, r = seg_metrics(all_g, gt_seg)
        print(f"  {'all-ground':16s} IoU {iou:.3f}  P {p:.3f}  R {r:.3f}")
        for name, elev in preds.items():
            iou, p, r = seg_metrics(seg(elev, thr), gt_seg)
            rmse = float(np.sqrt(np.mean((np.asarray(elev) - gt) ** 2)))
            print(f"  {name:16s} IoU {iou:.3f}  P {p:.3f}  R {r:.3f}"
                  f"  (grid RMSE {rmse:.3f} m)")


if __name__ == "__main__":
    main()
