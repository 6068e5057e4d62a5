#!/usr/bin/env python
"""Ground-truth dataset generation CLI.

Counterpart of the reference's semKitti_morph_data_camera.py /
semKitti_morph_data.py drivers (reference: semKitti_morph_data_camera.py:
316-371): converts raw SemanticKITTI sequences into reduced_velo/gnd_labels
training pairs, block-parallel across processes.

Example:
  python scripts/generate_data.py --config camera \
      --data_dir /data/semantic_kitti --out_dir /data/gnd_training \
      --sequences 00 01 02
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="kitti_sem")
    p.add_argument("--data_dir", required=True,
                   help="SemanticKITTI root (contains sequences/)")
    p.add_argument("--out_dir", default="",
                   help="output root (default: config data_prep.out_dir)")
    p.add_argument("--sequences", nargs="*", default=None)
    p.add_argument("--num_workers", type=int, default=None)
    args = p.parse_args()

    from gndnet_tpu.config import load_config
    from gndnet_tpu.data.generator import generate_dataset
    from gndnet_tpu.utils.logging import setup_logger

    logger = setup_logger("dataprep", "dataprep.log")
    cfg = load_config(args.config)
    if args.num_workers is not None:
        cfg = cfg.replace(
            data_prep=cfg.data_prep.__class__(
                **{**cfg.data_prep.__dict__, "num_workers": args.num_workers}))
    out_dir = args.out_dir or cfg.data_prep.out_dir
    if not out_dir:
        p.error("--out_dir required (config data_prep.out_dir is empty)")

    n = generate_dataset(args.data_dir, out_dir, cfg,
                         sequences=args.sequences, logger=logger)
    logger.info("generated %d frames into %s", n, out_dir)


if __name__ == "__main__":
    main()
