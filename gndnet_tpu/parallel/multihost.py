"""Multi-host (multi-process) SPMD utilities.

SURVEY.md section 2.3 scales past one host with `jax.distributed` over DCN;
the reference has no equivalent (its Slurm scripts launch independent 1-GPU
jobs, reference: run_model_training_cluster.sh:1-17).  The contract is
standard single-program JAX: every host runs the same script,
`initialize()` first, then builds ONE global mesh and feeds its local batch
shard; collectives ride ICI within a slice and cross DCN only between
slices (docs/SCALING.md).

`scripts/launch_multihost.py` is the runnable entry point; the 2-process
localhost CPU test (tests/test_multihost.py) proves the wiring without TPU
pods.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """`jax.distributed.initialize` with explicit or env-derived topology.

    On TPU pods all arguments come from the environment and every host calls
    this with no arguments; explicit values support localhost testing and
    bare-metal DCN clusters."""
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def global_mesh(dp: int, sp: int = 1) -> Mesh:
    """A (dp, sp) mesh over ALL global devices, host-locality aware.

    `mesh_utils.create_device_mesh` keeps devices of one process contiguous
    along the leading (dp) axis so sync-BN psums and halo ppermutes stay on
    ICI wherever the topology allows; dp is the only axis that crosses DCN."""
    n = jax.device_count()
    if dp * sp != n:
        raise ValueError(f"mesh {dp}x{sp} must cover all {n} global devices")
    from jax.experimental import mesh_utils

    try:
        devices = mesh_utils.create_device_mesh((dp, sp))
    except (ValueError, AssertionError):  # odd shapes on virtual devices
        devices = np.asarray(jax.devices()).reshape(dp, sp)
    return Mesh(devices, axis_names=("dp", "sp"))


def local_batch_to_global(mesh: Mesh, batch):
    """Assemble per-process batch shards into global dp-sharded arrays.

    Each process passes its LOCAL (points, labels, ...) arrays; the result is
    one global jax.Array per leaf, batch-sharded over dp, usable directly by
    make_dp_train_step / make_spmd_train_step."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)


def replicate_global(mesh: Mesh, tree):
    """Replicate host-identical values (params, opt state) over the mesh.

    Values must be identical on every process (same seed / same restore) —
    the standard SPMD invariant."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def process_slice(n_frames: int, batch_size: int) -> slice:
    """This process's contiguous frame range for a host-split dataset:
    process i of k feeds frames [i*n/k, (i+1)*n/k) and a per-process
    batch of batch_size // k."""
    k = jax.process_count()
    i = jax.process_index()
    per = n_frames // k
    return slice(i * per, (i + 1) * per if i < k - 1 else n_frames)
