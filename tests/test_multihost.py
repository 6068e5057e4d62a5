"""2-process localhost multi-host test (SURVEY.md section 2.3 DCN row).

Spawns two CPU worker processes via scripts/launch_multihost.py: each joins
a jax.distributed cluster, builds one global 2x2 (dp x sp) mesh spanning
both processes, feeds its local batch shard, and runs the full dp x sp
training step.  SPMD invariant: both processes must report identical losses.
Skips when the environment cannot run the cluster (no localhost sockets)."""

import os
import re
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_localhost_training():
    script = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                          "launch_multihost.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    try:
        proc = subprocess.run(
            [sys.executable, script, "--spawn", "2",
             "--devices-per-process", "2", "--steps", "2"],
            env=env, capture_output=True, text=True, timeout=560)
    except subprocess.TimeoutExpired:
        pytest.skip("localhost jax.distributed cluster timed out here")
    if proc.returncode != 0 and "DEADLINE_EXCEEDED" in proc.stdout:
        pytest.skip("localhost coordinator unreachable in this sandbox")
    assert proc.returncode == 0, proc.stdout + proc.stderr

    losses = {}
    for pid, step, loss in re.findall(
            r"\[proc (\d+)\] step (\d+) loss ([\d.]+)", proc.stdout):
        losses.setdefault((int(pid)), {})[int(step)] = float(loss)
    assert set(losses) == {0, 1}, proc.stdout
    assert losses[0] == losses[1], f"SPMD loss divergence: {losses}"
    assert len(losses[0]) == 2
    assert "global=4" in proc.stdout  # the mesh really spanned 2 processes
