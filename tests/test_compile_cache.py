"""Cold-start elimination: persistent compile cache + AOT executables.

The reference re-pays its warmup dry run on every node start
(reference ros_node.py:73-95); utils/compile_cache.py makes the XLA
equivalent (75-150 s first compile) a one-time cost."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gndnet_tpu.config import GndNetConfig
from gndnet_tpu.infer import GroundInferenceEngine
from gndnet_tpu.models.gndnet import init_model
from gndnet_tpu.utils.compile_cache import (
    enable_compilation_cache,
    load_compiled,
    save_compiled,
)

CFG = GndNetConfig(
    pc_range=(0.0, -8.0, -4.0, 16.0, 8.0, 4.0),
    grid_range=(0.0, -8.0, 16.0, 8.0),
    voxel_size=(1.0, 1.0, 8.0),
    max_points_voxel=20,
    max_voxels=256,
    input_features=4,
    num_points=512,
    lidar_height=1.7,
    use_norm=False,
)


def plane_cloud(rng, n, z=-1.7):
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(0.2, 15.8, n)
    pts[:, 1] = rng.uniform(-7.8, 7.8, n)
    pts[:, 2] = z + rng.normal(0, 0.01, n)
    return pts


def test_persistent_cache_writes_entries(tmp_path):
    cache = tmp_path / "xla_cache"
    enable_compilation_cache(str(cache), min_compile_seconds=0.0)
    try:
        # a shape/program no other test compiles, so the entry is ours
        @jax.jit
        def f(x):
            return jnp.cumsum(x * 3.0 + 1.0)

        f(jnp.arange(173, dtype=jnp.float32)).block_until_ready()
        entries = list(cache.rglob("*"))
        assert any(p.is_file() for p in entries), (
            "persistent cache dir has no entries after a jit compile")
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_engine_aot_roundtrip(tmp_path, rng):
    _, variables = init_model(CFG)
    src = GroundInferenceEngine(CFG, variables, threshold=0.08, bucket=256)
    path = str(tmp_path / "engine.aot")
    size = src.aot_save(path)
    assert size > 0

    dst = GroundInferenceEngine(CFG, variables, threshold=0.08, bucket=256)
    dst.aot_load(path)

    # matching padded shape (300 -> 512 = the artifact shape): AOT path
    pts = plane_cloud(rng, n=300)
    elev_a, lab_a = dst.infer(pts)
    elev_j, lab_j = src.infer(pts)
    np.testing.assert_array_equal(np.asarray(elev_a), np.asarray(elev_j))
    np.testing.assert_array_equal(lab_a, lab_j)

    # non-matching padded shape (600 -> 768): falls back to the jit path
    big = plane_cloud(rng, n=600)
    elev_b, lab_b = dst.infer(big)
    assert elev_b.shape == (CFG.ny, CFG.nx) and lab_b.shape == (600,)


def test_load_compiled_rejects_mismatches(tmp_path):
    _, variables = init_model(CFG)
    eng = GroundInferenceEngine(CFG, variables, bucket=256)
    path = str(tmp_path / "engine.aot")
    eng.aot_save(path)

    with open(path, "rb") as f:
        payload = pickle.load(f)

    tampered = dict(payload, platform="tpu-v9")
    bad = tmp_path / "wrong_platform.aot"
    bad.write_bytes(pickle.dumps(tampered))
    with pytest.raises(ValueError, match="compiled for"):
        load_compiled(str(bad))

    tampered = dict(payload, jax_version="0.0.1")
    bad = tmp_path / "wrong_version.aot"
    bad.write_bytes(pickle.dumps(tampered))
    with pytest.raises(ValueError, match="jax 0.0.1"):
        load_compiled(str(bad))

    (tmp_path / "not_aot.aot").write_bytes(pickle.dumps({"magic": "nope"}))
    with pytest.raises(ValueError, match="not a gndnet AOT artifact"):
        load_compiled(str(tmp_path / "not_aot.aot"))


def test_save_compiled_atomic_and_loadable(tmp_path):
    @jax.jit
    def g(x):
        return x @ x.T

    comp = g.lower(jnp.zeros((8, 8), jnp.float32)).compile()
    path = str(tmp_path / "g.aot")
    save_compiled(path, comp)
    loaded = load_compiled(path)
    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    np.testing.assert_array_equal(np.asarray(loaded(x)), np.asarray(g(x)))


def test_engine_aot_custom_shape_dispatch(rng, monkeypatch):
    """An artifact saved for a CUSTOM n dispatches on the shape it was
    compiled for (recorded in the artifact meta), not the engine default:
    matching scans run the AOT executable, others fall back to jit.

    The loader is mocked: XLA:CPU's AOT loader has a per-process function
    registry, and deserializing a SECOND engine artifact in one process
    collides with the first ('Buffer Definition Event: Function
    wrapped_iota not found') — real deserialization is covered by the
    single-load roundtrip test above; this one pins the dispatch logic."""
    import gndnet_tpu.utils.compile_cache as cc

    _, variables = init_model(CFG)
    eng = GroundInferenceEngine(CFG, variables, threshold=0.08, bucket=256)
    custom_shape = eng._example_input(600).shape         # (768, F)
    hits = []

    def fake_loaded(variables, padded):
        hits.append(padded.shape)
        return eng._jit(variables, padded)

    monkeypatch.setattr(cc, "load_compiled",
                        lambda path, return_meta=False: (
                            fake_loaded,
                            {"example_shape": tuple(custom_shape),
                             "transfer_dtype": "float32"}))
    eng.aot_load("ignored.aot")
    eng.infer(plane_cloud(rng, n=600))           # pads to 768 -> AOT hit
    eng.infer(plane_cloud(rng, n=300))           # pads to 512 -> jit
    assert hits == [custom_shape]

    # transfer-dtype mismatch fails fast
    eng16 = GroundInferenceEngine(CFG, variables, threshold=0.08,
                                  bucket=256, transfer_dtype="int16")
    with pytest.raises(ValueError, match="transfer_dtype"):
        eng16.aot_load("ignored.aot")


def test_aot_meta_roundtrip(tmp_path):
    """save_compiled stores caller meta; load_compiled returns it (and
    artifacts remain loadable without requesting it)."""
    import jax.numpy as jnp

    from gndnet_tpu.utils.compile_cache import load_compiled, save_compiled

    compiled = jax.jit(lambda x: x * 2.0).lower(
        jnp.zeros((7,), jnp.float32)).compile()
    path = str(tmp_path / "f.aot")
    save_compiled(path, compiled, meta={"example_shape": (7,)})
    fn, meta = load_compiled(path, return_meta=True)
    assert meta["example_shape"] == (7,)
    np.testing.assert_array_equal(
        np.asarray(fn(jnp.ones((7,), jnp.float32))), np.full(7, 2.0))
    fn2 = load_compiled(path)
    assert float(fn2(jnp.ones((7,), jnp.float32))[0]) == 2.0
