#!/usr/bin/env python
"""Offline training-log analytics: parse a training.log and plot loss curves.

Counterpart of reference scripts/log_parser.py:14-87.

Example: python scripts/plot_losses.py training.log --out losses.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log_file")
    p.add_argument("--out", default="losses.png")
    args = p.parse_args()

    from gndnet_tpu.utils.logging import parse_log_file, plot_epoch_losses

    parsed = parse_log_file(args.log_file)
    print(f"epochs: {len(parsed['epochs'])}")
    for e, t in zip(parsed["epochs"], parsed["train_loss"]):
        print(f"  epoch {e}: train {t:.6f}")
    plot_epoch_losses(parsed, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
