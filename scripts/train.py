#!/usr/bin/env python
"""Training CLI.

Flag-compatible counterpart of the reference's training entry point
(reference: training.py:63-70): --config / --resume / --evaluate /
--save_checkpoints / --start_epoch / --print-freq, plus TPU-specific
--workdir and --epochs override.

Example:
  python scripts/train.py --config kitti_sem -s --workdir runs/kitti
  python scripts/train.py --config config/my.yaml --resume --workdir runs/kitti
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="kitti_sem",
                   help="preset name or YAML path")
    p.add_argument("--print-freq", "-p", default=100, type=int, metavar="N")
    p.add_argument("--resume", action="store_true",
                   help="resume from the workdir's latest checkpoint")
    p.add_argument("-e", "--evaluate", action="store_true",
                   help="only run validation")
    p.add_argument("-s", "--save_checkpoints", action="store_true")
    p.add_argument("--workdir", default=".")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train_skip", type=int, default=6,
                   help="use every k-th training frame (reference skip=6)")
    p.add_argument("--valid_skip", type=int, default=3)
    p.add_argument("--impl", default=None,
                   choices=[None, "scatter", "affine", "sorted"],
                   help="fused frontend override: 'affine' runs the pallas "
                        "mega-kernel fwd+bwd (3.3x step speedup at B=16, "
                        "same trajectory to float tolerance); default keeps "
                        "the config's impl (scatter = bit-parity)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 conv compute (serving precision) for "
                        "training; pair with --impl affine for the fastest "
                        "step (394 scans/s vs 98 at f32 scatter on a v5e)")
    p.add_argument("--augment", action="store_true",
                   help="on-device augmentation inside the jitted train step "
                        "(random rotation + height with exact label "
                        "co-transform; RNG = fold_in(key, step), so resumes "
                        "are deterministic).  Replaces the reference's "
                        "pre-augmented dataset generation "
                        "(dataset_augmentation.py:49-70)")
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel mesh size (default: all visible "
                        "devices / sp).  dp*sp > 1 trains over a "
                        "jax.sharding.Mesh with dp-sharded batches, synced "
                        "gradients/BN, and mesh-sharded checkpoints — the "
                        "in-library replacement for the reference's Slurm "
                        "scale-out (run_model_training_cluster.sh)")
    p.add_argument("--sp", type=int, default=1,
                   help="spatial-parallel mesh size: pseudo-image height "
                        "sharded with halo exchange (parallel/spatial.py); "
                        "requires use_norm=false")
    p.add_argument("--cache_dir", default=None,
                   help="persistent XLA compilation-cache directory: later "
                        "runs of the same program skip the 75-150 s first "
                        "compile (utils/compile_cache.py)")
    args = p.parse_args()

    if args.cache_dir:
        from gndnet_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(args.cache_dir)

    from gndnet_tpu.config import load_config
    from gndnet_tpu.train import train_and_evaluate
    from gndnet_tpu.utils.logging import setup_logger

    cfg = load_config(args.config)
    if args.data_dir:
        cfg = cfg.replace(data_dir=args.data_dir)
    if args.impl:
        cfg = cfg.replace(fused_impl=args.impl)
    if args.bf16:
        cfg = cfg.replace(compute_dtype="bfloat16",
                          matmul_precision="default")
    os.makedirs(args.workdir, exist_ok=True)
    logger = setup_logger("train", os.path.join(args.workdir, "training.log"))
    logger.info("config: %s", args.config)

    sp = args.sp
    dp = args.dp
    if dp is None:
        import jax

        dp = max(jax.device_count() // sp, 1)

    if args.evaluate:
        hist = train_and_evaluate(
            cfg, workdir=args.workdir, epochs=0, resume=True,
            save_checkpoints=False, print_freq=args.print_freq,
            seed=args.seed, train_skip=args.train_skip,
            valid_skip=args.valid_skip, dp=dp, sp=sp, logger=logger)
        logger.info("validation only: loss %.6f", hist["valid_loss"][-1])
        return

    hist = train_and_evaluate(
        cfg, workdir=args.workdir, epochs=args.epochs, resume=args.resume,
        save_checkpoints=args.save_checkpoints, print_freq=args.print_freq,
        seed=args.seed, train_skip=args.train_skip,
        valid_skip=args.valid_skip, augment=args.augment,
        dp=dp, sp=sp, logger=logger)
    logger.info("done: lowest validation loss %.6f", hist["lowest_loss"])


if __name__ == "__main__":
    main()
