"""Cold-start elimination: persistent XLA compilation cache + AOT executables.

The reference warms its CUDA/cudnn kernels with a synthetic-plane dry run on
every node start (ros_node.py:73-95) — a few seconds of GPU JIT.  The XLA
analog is much steeper: the first compile of the fused serving program after
boot costs 75-150 s in this environment, which a latency-sensitive deployment
cannot pay per process.  Two standing fixes, both wrapped here:

* `enable_compilation_cache(dir)` — JAX's persistent compilation cache:
  every `jit` compile (including the Mosaic kernel custom-calls, which are
  compiled inside the XLA executable) is keyed by HLO fingerprint and
  written to `dir`; later processes with the same program/topology load the
  executable instead of recompiling.  Safe to call early and always — it is
  a pure read-through cache.

* `save_compiled(path, compiled)` / `load_compiled(path)` — explicit AOT
  artifacts via `jax.experimental.serialize_executable`: a shape-specialized
  compiled program is pickled to a single file that a serving process can
  load without re-tracing or re-lowering (GroundInferenceEngine.aot_save /
  aot_load use these).  Unlike the cache, the artifact pins the exact input
  shapes, dtypes, jax version, and device topology — `load_compiled`
  restores only on a matching platform and raises otherwise.
"""

from __future__ import annotations

import os
import pickle

import jax

_AOT_MAGIC = "gndnet-aot-v1"


def enable_compilation_cache(cache_dir: str,
                             min_compile_seconds: float = 1.0) -> str:
    """Turn on JAX's persistent compilation cache rooted at `cache_dir`.

    Compiles cheaper than `min_compile_seconds` are not persisted (they are
    cheaper to redo than to deserialize).  Returns the cache dir.  Idempotent;
    call once per process before the first jit execution you want cached.
    """
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_seconds))
    # cache regardless of how small the executable is
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def save_compiled(path: str, compiled, meta: dict | None = None) -> int:
    """Serialize a `jax.stages.Compiled` to `path`; returns the byte size.

    The artifact records the platform and jax version so `load_compiled` can
    fail fast on mismatch instead of crashing inside the runtime.  `meta`
    is an arbitrary pickle-able dict stored alongside (callers record the
    example input shape/dtype the executable was specialized for;
    `load_compiled(..., return_meta=True)` hands it back).
    """
    from jax.experimental import serialize_executable as se

    try:
        blob, in_tree, out_tree = se.serialize(compiled)
    except jax.errors.JaxRuntimeError as e:
        # backend-dependent: TPU executables serialize wholesale; the CPU
        # PJRT backend cannot serialize some ops (e.g. sort comparators ->
        # "`LessThan` is not serializable").  The persistent compilation
        # cache (enable_compilation_cache) covers those cases instead.
        raise NotImplementedError(
            f"this backend ({jax.default_backend()}) cannot serialize the "
            f"compiled program ({e}); use enable_compilation_cache() for "
            f"cold-start caching instead") from e
    payload = {
        "magic": _AOT_MAGIC,
        "platform": jax.default_backend(),
        "jax_version": jax.__version__,
        # the executable is bound to a fixed device count; deserialization
        # defaults to ALL local devices, which breaks on any host whose
        # visible device count differs from compile time (e.g. an 8-virtual-
        # device test mesh loading a 1-device serving program)
        "num_devices": len(compiled.runtime_executable().local_devices()),
        "blob": blob,
        "in_tree": in_tree,
        "out_tree": out_tree,
        "meta": dict(meta or {}),
    }
    data = pickle.dumps(payload, protocol=pickle.HIGHEST_PROTOCOL)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: a crashed writer never half-writes
    return len(data)


def load_compiled(path: str, return_meta: bool = False):
    """Load an AOT artifact written by `save_compiled`.

    Returns a callable with the original (pre-lowering) call signature
    (or `(callable, meta)` with `return_meta=True`; artifacts from before
    the meta field load with an empty dict).  Raises ValueError on
    platform/version mismatch — the executable format is not stable
    across either.
    """
    from jax.experimental import serialize_executable as se

    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("magic") != _AOT_MAGIC:
        raise ValueError(f"{path} is not a gndnet AOT artifact")
    if payload["platform"] != jax.default_backend():
        raise ValueError(
            f"AOT artifact was compiled for {payload['platform']!r}, "
            f"current backend is {jax.default_backend()!r}")
    if payload["jax_version"] != jax.__version__:
        raise ValueError(
            f"AOT artifact was compiled with jax {payload['jax_version']}, "
            f"running {jax.__version__} (executables are not stable across "
            f"versions; re-run aot_save)")
    n = payload.get("num_devices", 1)
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"AOT artifact needs {n} devices, host has {len(devices)}")
    loaded = se.deserialize_and_load(payload["blob"], payload["in_tree"],
                                      payload["out_tree"],
                                      execution_devices=devices[:n])
    if return_meta:
        return loaded, payload.get("meta", {})
    return loaded
