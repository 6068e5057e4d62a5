#!/usr/bin/env python
"""SemanticKITTI evaluation CLI.

Counterpart of reference evaluate_SemanticKITTI.py (reference: :48-56):
per-frame IoU / precision / recall / masked height-MSE plus dataset averages.

Example:
  python scripts/evaluate.py --config kitti_sem --data_dir data/testing/00 \
      --resume checkpoint.pth.tar
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="kitti_sem")
    p.add_argument("--data_dir", required=True,
                   help="sequence dir with velodyne/ and labels/")
    p.add_argument("--resume", default="", help=".pth.tar or orbax dir")
    p.add_argument("--threshold", type=float, default=0.0,
                   help="segmentation threshold (reference eval uses 0)")
    p.add_argument("--corrected", action="store_true",
                   help="use corrected heightmap semantics instead of "
                        "reference-bug-compatible MSE")
    args = p.parse_args()

    from gndnet_tpu.config import load_config
    from gndnet_tpu.evaluate import evaluate_semantic_kitti
    from gndnet_tpu.models.gndnet import init_model
    from gndnet_tpu.utils.logging import setup_logger

    logger = setup_logger("evaluate")
    cfg = load_config(args.config)
    model, variables = init_model(cfg)
    if args.resume:
        if args.resume.endswith((".pth.tar", ".pth")):
            from gndnet_tpu.checkpoint import load_torch_checkpoint

            variables = load_torch_checkpoint(args.resume, cfg)["variables"]
        else:
            from gndnet_tpu.checkpoint import CheckpointManager

            state = CheckpointManager(args.resume).restore()["state"]
            variables = {"params": state["params"],
                         "batch_stats": state["batch_stats"]}

    result = evaluate_semantic_kitti(
        cfg, variables, args.data_dir, threshold=args.threshold,
        reference_compat=not args.corrected, logger=logger)
    print(result.as_dict())


if __name__ == "__main__":
    main()
