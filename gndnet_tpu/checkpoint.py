"""Checkpointing: orbax-backed save/restore + PyTorch .pth.tar interchange.

Replaces both reference checkpoint systems:

* live path — a single `torch.save({'epoch','state_dict','lowest_loss',
  'optimizer'})` plus a `model_best` copy (reference: training.py:296-316)
  and `--resume` restore (training.py:264-275);
* dormant torchplus manager — JSON registry, `max_to_keep` GC, keep-latest
  semantics (reference: torchplus/train/checkpoint.py:10-174).

`CheckpointManager` provides latest/best retention with garbage collection.
`import_torch_state_dict` / `export_torch_state_dict` convert between the
reference's parameter naming ('voxel_feature_extractor.pfn_layers.0.linear.
weight', 'encoder_decoder.down1.conv1.cbr_unit.0.weight', ...) and our flax
variable tree, so pretrained reference weights load bit-true (weight layout:
torch Linear (out,in) -> flax kernel (in,out); torch Conv2d (O,I,kH,kW) ->
flax (kH,kW,I,O)).
"""

from __future__ import annotations

import contextlib
import os
import shutil
import signal
import threading
from typing import Any, Mapping

import jax
import numpy as np
import orbax.checkpoint as ocp

from gndnet_tpu.config import GndNetConfig

# ---------------------------------------------------------------------------
# torch state-dict interchange
# ---------------------------------------------------------------------------

_SEG_STAGES = ("down1", "down2", "up2", "up1")
_SEG_CONVS = ("conv1", "conv2")


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def import_torch_state_dict(
    state_dict: Mapping[str, Any], cfg: GndNetConfig
) -> dict:
    """Convert a reference GndNet state_dict into flax `variables`.

    Returns {'params': ..., 'batch_stats': ...} matching
    models.gndnet.GroundEstimatorNet.  Handles both use_norm variants of the
    PFN (SURVEY.md hard-part #5) and strips an optional 'module.' DataParallel
    prefix.
    """
    sd = { (k[7:] if k.startswith("module.") else k): _to_np(v)
           for k, v in state_dict.items() }

    params: dict = {"voxel_feature_extractor": {}, "encoder_decoder": {}}
    stats: dict = {"voxel_feature_extractor": {}, "encoder_decoder": {}}

    # --- PFN layers ---
    for i in range(len(cfg.vfe_filters)):
        src = f"voxel_feature_extractor.pfn_layers.{i}"
        dst: dict = {"linear": {"kernel": sd[f"{src}.linear.weight"].T}}
        if f"{src}.linear.bias" in sd:
            dst["linear"]["bias"] = sd[f"{src}.linear.bias"]
        if f"{src}.norm.weight" in sd:
            dst["norm"] = {
                "scale": sd[f"{src}.norm.weight"],
                "bias": sd[f"{src}.norm.bias"],
            }
            stats["voxel_feature_extractor"][f"pfn_{i}"] = {
                "norm": {
                    "mean": sd[f"{src}.norm.running_mean"],
                    "var": sd[f"{src}.norm.running_var"],
                }
            }
        params["voxel_feature_extractor"][f"pfn_{i}"] = dst

    # --- SegNet ---
    enc_p: dict = {}
    enc_s: dict = {}
    for stage in _SEG_STAGES:
        enc_p[stage], enc_s[stage] = {}, {}
        for conv in _SEG_CONVS:
            src = f"encoder_decoder.{stage}.{conv}.cbr_unit"
            enc_p[stage][conv] = {
                "conv": {
                    "kernel": sd[f"{src}.0.weight"].transpose(2, 3, 1, 0),
                    "bias": sd[f"{src}.0.bias"],
                },
                "bn": {
                    "scale": sd[f"{src}.1.weight"],
                    "bias": sd[f"{src}.1.bias"],
                },
            }
            enc_s[stage][conv] = {
                "bn": {
                    "mean": sd[f"{src}.1.running_mean"],
                    "var": sd[f"{src}.1.running_var"],
                }
            }
    enc_p["regressor"] = {
        "kernel": sd["encoder_decoder.regressor.weight"].transpose(2, 3, 1, 0),
        "bias": sd["encoder_decoder.regressor.bias"],
    }
    params["encoder_decoder"] = enc_p
    stats["encoder_decoder"] = enc_s

    return {"params": params, "batch_stats": _prune(stats)}


def export_torch_state_dict(variables: Mapping[str, Any], cfg: GndNetConfig) -> dict:
    """Inverse of `import_torch_state_dict` (numpy-valued state dict)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict = {}

    for i in range(len(cfg.vfe_filters)):
        p = params["voxel_feature_extractor"][f"pfn_{i}"]
        src = f"voxel_feature_extractor.pfn_layers.{i}"
        sd[f"{src}.linear.weight"] = np.asarray(p["linear"]["kernel"]).T
        if "bias" in p["linear"]:
            sd[f"{src}.linear.bias"] = np.asarray(p["linear"]["bias"])
        if "norm" in p:
            s = stats["voxel_feature_extractor"][f"pfn_{i}"]["norm"]
            sd[f"{src}.norm.weight"] = np.asarray(p["norm"]["scale"])
            sd[f"{src}.norm.bias"] = np.asarray(p["norm"]["bias"])
            sd[f"{src}.norm.running_mean"] = np.asarray(s["mean"])
            sd[f"{src}.norm.running_var"] = np.asarray(s["var"])

    enc = params["encoder_decoder"]
    enc_s = stats.get("encoder_decoder", {})
    for stage in _SEG_STAGES:
        for conv in _SEG_CONVS:
            p = enc[stage][conv]
            s = enc_s[stage][conv]["bn"]
            src = f"encoder_decoder.{stage}.{conv}.cbr_unit"
            sd[f"{src}.0.weight"] = np.asarray(p["conv"]["kernel"]).transpose(3, 2, 0, 1)
            sd[f"{src}.0.bias"] = np.asarray(p["conv"]["bias"])
            sd[f"{src}.1.weight"] = np.asarray(p["bn"]["scale"])
            sd[f"{src}.1.bias"] = np.asarray(p["bn"]["bias"])
            sd[f"{src}.1.running_mean"] = np.asarray(s["mean"])
            sd[f"{src}.1.running_var"] = np.asarray(s["var"])
    sd["encoder_decoder.regressor.weight"] = np.asarray(
        enc["regressor"]["kernel"]
    ).transpose(3, 2, 0, 1)
    sd["encoder_decoder.regressor.bias"] = np.asarray(enc["regressor"]["bias"])
    return sd


def load_torch_checkpoint(path: str, cfg: GndNetConfig) -> dict:
    """Load a reference .pth.tar checkpoint file.

    Returns {'variables', 'epoch', 'lowest_loss'} mirroring the reference's
    saved dict (training.py:300-305).  Requires torch for unpickling.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    return {
        "variables": import_torch_state_dict(state_dict, cfg),
        "epoch": ckpt.get("epoch", 0),
        "lowest_loss": ckpt.get("lowest_loss", float("inf")),
    }


def _prune(d):
    """Drop empty sub-dicts so the tree matches flax's variable layout."""
    if not isinstance(d, dict):
        return d
    out = {k: _prune(v) for k, v in d.items()}
    return {k: v for k, v in out.items() if not (isinstance(v, dict) and not v)}


# ---------------------------------------------------------------------------
# Sharded-restore templates
# ---------------------------------------------------------------------------


def abstract_sharded(tree, mesh, spec=None):
    """Build a restore template that places every array leaf onto `mesh`.

    Array leaves become `jax.ShapeDtypeStruct`s carrying a
    `NamedSharding(mesh, spec)` (default: fully replicated — the layout of a
    TrainState under dp x sp SPMD training, parallel/mesh.replicate), so
    `CheckpointManager.restore(template=...)` materializes each leaf
    directly as a sharded `jax.Array` on the target mesh — including
    RE-sharding a checkpoint written from a different mesh layout (orbax
    reads per-shard and reassembles).  Non-array leaves (step counters
    saved as scalars restore as 0-d arrays; ints/floats/None pass through)
    are returned unchanged.

    This is the distributed-training resume story the reference never had
    (its checkpoints were single-process torch.save, training.py:296-316);
    required by our own multi-host path (parallel/multihost.py).
    """
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec() if spec is None else spec)

    def leaf(x):
        if isinstance(x, jax.Array) or isinstance(x, np.ndarray):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return x

    return jax.tree_util.tree_map(leaf, tree)


# ---------------------------------------------------------------------------
# Orbax-backed manager with latest/best retention
# ---------------------------------------------------------------------------


class CheckpointManager:
    """Latest/best checkpointing with max_to_keep GC.

    Reproduces the live reference semantics (checkpoint + model_best copy,
    training.py:296-316) on top of orbax, plus the torchplus manager's
    max_to_keep garbage collection (torchplus/train/checkpoint.py:62-113).
    """

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best_dir = os.path.join(self.directory, "best")

    @contextlib.contextmanager
    def _defer_sigint(self):
        """Delay Ctrl-C until the write completes so checkpoints are never
        torn (the torchplus manager's SIGINT-safe saves,
        reference: torchplus/train/checkpoint.py:62-113)."""
        if threading.current_thread() is not threading.main_thread():
            yield
            return
        pending = []
        old = signal.signal(signal.SIGINT,
                            lambda s, f: pending.append((s, f)))
        try:
            yield
        finally:
            signal.signal(signal.SIGINT, old)
            if pending:
                os.kill(os.getpid(), signal.SIGINT)

    def save(self, step: int, state, is_best: bool = False) -> None:
        """Save a pytree `state` at `step`; mirror to best/ when is_best.

        `state` may hold host values OR live (sharded/replicated) jax.Arrays
        — orbax writes device arrays shard-by-shard with sharding metadata,
        so a dp x sp TrainState saves without any host gather.  Under
        multi-process SPMD (jax.distributed) every process must call save
        with its view of the same global arrays; orbax coordinates the
        write, and only process 0 mirrors the best/ copy."""
        with self._defer_sigint():
            self._mgr.save(step, args=ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
            if is_best and jax.process_index() == 0:
                src = os.path.join(self.directory, str(step))
                if os.path.isdir(self._best_dir):
                    shutil.rmtree(self._best_dir)
                shutil.copytree(src, self._best_dir)

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, step: int | None = None, template=None):
        """Restore `step` (default latest). Pass `template` pytree to recover
        exact array types/dtypes."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def restore_best(self, template=None):
        if not os.path.isdir(self._best_dir):
            return None
        ckptr = ocp.StandardCheckpointer()
        # orbax nests items under the manager's per-step layout
        item_dir = os.path.join(self._best_dir, "default")
        target = item_dir if os.path.isdir(item_dir) else self._best_dir
        if template is not None:
            return ckptr.restore(target, target=template)
        return ckptr.restore(target)

    def close(self):
        self._mgr.close()
