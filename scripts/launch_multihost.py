"""Multi-host SPMD launcher: one process per host, DCN via jax.distributed.

Fills SURVEY.md section 2.3's multi-host row with runnable code (round 1
shipped only prose, docs/SCALING.md).  Every host runs THIS script with the
same arguments except --process-id; the coordinator (process 0's address)
bootstraps the jax.distributed cluster, after which a single global (dp, sp)
mesh spans all hosts and the ordinary dp x sp training step from
parallel/spatial.py runs unchanged — collectives cross DCN only on dp.

On TPU pods, omit the topology flags (jax.distributed reads the pod
metadata) and launch with your scheduler:
    gcloud compute tpus tpu-vm ssh $VM --worker=all \
        --command="python scripts/launch_multihost.py --steps 100 ..."

Localhost self-test (what tests/test_multihost.py automates):
    python scripts/launch_multihost.py --spawn 2 --devices-per-process 2

Each spawned process forces the CPU platform with N virtual devices,
builds the global 2x2 mesh across both processes, feeds its local batch
shard, and must print identical losses (the SPMD invariant).
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_worker(args) -> None:
    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        if args.devices_per_process > 1:
            jax.config.update("jax_num_cpu_devices", args.devices_per_process)

    import numpy as np

    from gndnet_tpu.config import GndNetConfig
    from gndnet_tpu.parallel import multihost
    from gndnet_tpu.parallel.spatial import make_spmd_train_step
    from gndnet_tpu.train import create_train_state

    multihost.initialize(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    pid, nproc = jax.process_index(), jax.process_count()
    print(f"[proc {pid}/{nproc}] local={jax.local_device_count()} "
          f"global={jax.device_count()}", flush=True)

    cfg = GndNetConfig(
        pc_range=(0.0, -8.0, -4.0, 16.0, 8.0, 4.0),
        grid_range=(0.0, -8.0, 16.0, 8.0),
        voxel_size=(1.0, 1.0, 8.0),
        max_points_voxel=16,
        max_voxels=256,
        input_features=4,
        use_norm=False,
    ) if args.config == "tiny" else None
    if cfg is None:
        from gndnet_tpu.config import load_config

        cfg = load_config(args.config)

    sp = args.sp
    dp = jax.device_count() // sp
    mesh = multihost.global_mesh(dp=dp, sp=sp)
    model, tx, state = create_train_state(cfg, steps_per_epoch=10)
    step = make_spmd_train_step(model, tx, cfg, mesh,
                                augment=args.augment)
    state = multihost.replicate_global(mesh, state)

    # synthetic local shard: every process holds batch/nproc scans
    local_b = max(dp // nproc, 1) * 2
    rng = np.random.default_rng(1234 + pid)
    n = min(cfg.num_points, 256)
    pts = np.zeros((local_b, n, cfg.input_features), np.float32)
    pts[..., 0] = rng.uniform(cfg.pc_range[0] + 0.1, cfg.pc_range[3] - 0.1,
                              (local_b, n))
    pts[..., 1] = rng.uniform(cfg.pc_range[1] + 0.1, cfg.pc_range[4] - 0.1,
                              (local_b, n))
    pts[..., 2] = rng.uniform(-2.0, 0.0, (local_b, n))
    labels = np.zeros((local_b, cfg.ny, cfg.nx), np.float32)

    batch = multihost.local_batch_to_global(mesh, (pts, labels))
    for i in range(args.steps):
        state, loss = step(state, *batch)
        print(f"[proc {pid}] step {i} loss {float(loss):.6f}", flush=True)
    jax.block_until_ready(state.params)
    print(f"[proc {pid}] done", flush=True)


def spawn_local(args) -> int:
    """Fork num_processes localhost workers (CPU platform) and wait."""
    import socket

    with socket.socket() as s:  # pick a free coordinator port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    procs = []
    for pid in range(args.spawn):
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--coordinator", coordinator,
            "--num-processes", str(args.spawn),
            "--process-id", str(pid),
            "--platform", "cpu",
            "--devices-per-process", str(args.devices_per_process),
            "--sp", str(args.sp), "--steps", str(args.steps),
            "--config", args.config,
        ] + (["--augment"] if args.augment else [])
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    rc = 0
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        print(f"----- proc {pid} (rc={p.returncode}) -----\n{out}", flush=True)
        rc = rc or p.returncode
    return rc


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit on TPU pods)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                    help="force a platform (cpu for localhost testing)")
    ap.add_argument("--devices-per-process", type=int, default=2)
    ap.add_argument("--sp", type=int, default=2)
    ap.add_argument("--augment", action="store_true",
                    help="on-device augmentation inside the SPMD step "
                         "(RNG folds the dp axis index; sp rows share "
                         "one transform)")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--config", default="tiny")
    ap.add_argument("--spawn", type=int, default=0,
                    help="localhost self-test: fork N CPU workers")
    args = ap.parse_args()
    if args.spawn:
        return spawn_local(args)
    run_worker(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
