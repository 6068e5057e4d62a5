#!/usr/bin/env python
"""Checkpoint converter: reference .pth.tar <-> gndnet_tpu orbax.

Both directions are bit-true (checkpoint.import_torch_state_dict /
export_torch_state_dict), so users can move trained weights either way —
load a pretrained reference model here, or export a TPU-trained model back
into the reference's `torch.save({'epoch','state_dict','lowest_loss',...})`
layout (reference: training.py:300-305).

Examples:
  python scripts/convert_checkpoint.py --config kitti_sem \
      --from-torch checkpoint.pth.tar --to-orbax ckpts/
  python scripts/convert_checkpoint.py --config kitti_sem \
      --from-orbax runs/kitti/checkpoints --to-torch exported.pth.tar
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="kitti_sem")
    p.add_argument("--from-torch", default="", metavar="PTH")
    p.add_argument("--from-orbax", default="", metavar="DIR")
    p.add_argument("--to-torch", default="", metavar="PTH")
    p.add_argument("--to-orbax", default="", metavar="DIR")
    args = p.parse_args()
    if bool(args.from_torch) == bool(args.from_orbax):
        p.error("exactly one of --from-torch / --from-orbax is required")
    if not (args.to_torch or args.to_orbax):
        p.error("at least one of --to-torch / --to-orbax is required")

    import jax

    from gndnet_tpu.checkpoint import (
        CheckpointManager,
        export_torch_state_dict,
        load_torch_checkpoint,
    )
    from gndnet_tpu.config import load_config
    from gndnet_tpu.models.gndnet import init_model

    cfg = load_config(args.config)

    if args.from_torch:
        loaded = load_torch_checkpoint(args.from_torch, cfg)
        variables = loaded["variables"]
        epoch = loaded["epoch"]
        lowest = loaded["lowest_loss"]
    else:
        _, template = init_model(cfg)
        mgr = CheckpointManager(args.from_orbax)
        restored = mgr.restore()
        if restored is None:
            raise SystemExit(f"no checkpoint found in {args.from_orbax}")
        state = restored["state"]
        variables = {"params": state["params"],
                     "batch_stats": state["batch_stats"]}
        epoch = int(restored.get("epoch", 0))
        lowest = float(restored.get("lowest_loss", float("inf")))
        mgr.close()
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"loaded: epoch {epoch}, lowest_loss {lowest}, {n/1e6:.2f}M params")

    if args.to_orbax:
        mgr = CheckpointManager(args.to_orbax)
        mgr.save(max(epoch, 1),
                 {"state": jax.device_get(
                     {"params": variables["params"],
                      "batch_stats": variables["batch_stats"]}),
                  "epoch": epoch, "lowest_loss": lowest})
        mgr.close()
        print(f"wrote orbax checkpoint to {args.to_orbax}")
    if args.to_torch:
        import torch

        sd = {k: torch.from_numpy(v.copy())
              for k, v in export_torch_state_dict(variables, cfg).items()}
        torch.save({"epoch": epoch, "state_dict": sd,
                    "lowest_loss": lowest, "optimizer": {}}, args.to_torch)
        print(f"wrote torch checkpoint to {args.to_torch}")


if __name__ == "__main__":
    main()
