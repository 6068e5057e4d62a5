"""Model parity tests against torch-functional + numpy oracles.

torch (CPU) is used purely as a test oracle: we re-express the reference's
published architecture as functional torch calls, feed it weights exported
from our flax model via checkpoint.export_torch_state_dict, and require the
outputs to match.  This simultaneously validates the model math and the
.pth.tar weight interchange.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from gndnet_tpu.config import GndNetConfig
from gndnet_tpu.checkpoint import (
    export_torch_state_dict,
    import_torch_state_dict,
)
from gndnet_tpu.models.gndnet import GroundEstimatorNet, init_model
from gndnet_tpu.ops.pooling import max_pool_argmax, max_unpool
from gndnet_tpu.ops import pillarize as pz
from oracles import (
    decorate_oracle,
    pfn_forward_oracle,
    scatter_canvas_oracle,
    voxelize_oracle,
)

CFG = GndNetConfig(
    pc_range=(0.0, -8.0, -4.0, 16.0, 8.0, 4.0),
    grid_range=(0.0, -8.0, 16.0, 8.0),
    voxel_size=(1.0, 1.0, 8.0),
    max_points_voxel=20,
    max_voxels=256,
    input_features=4,
    batch_size=2,
    use_norm=False,
)


# ---------------------------------------------------------------------------
# pooling vs torch
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("hw", [(8, 8), (9, 7), (16, 10)])
def test_pool_unpool_matches_torch(rng, hw):
    h, w = hw
    x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
    pooled, idx = max_pool_argmax(jnp.asarray(x))
    restored = max_unpool(pooled, idx, (h, w))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    pt, it = F.max_pool2d(xt, 2, 2, return_indices=True)
    rt = F.max_unpool2d(pt, it, 2, 2, output_size=(h, w))

    np.testing.assert_allclose(
        np.asarray(pooled), pt.permute(0, 2, 3, 1).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(restored), rt.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_pool_gradients_flow():
    x = jnp.arange(32.0, dtype=jnp.float32).reshape(1, 4, 4, 2)

    def f(x):
        p, i = max_pool_argmax(x)
        return jnp.sum(max_unpool(p * 2.0, i, (4, 4)))

    g = jax.grad(f)(x)
    # gradient lands only on window-max elements, value 2.
    assert float(jnp.sum(g)) == pytest.approx(2.0 * 2 * 2 * 2)
    assert set(np.unique(np.asarray(g))) <= {0.0, 2.0}


# ---------------------------------------------------------------------------
# torch-functional SegNet oracle
# ---------------------------------------------------------------------------

def torch_cbr(x, sd, prefix):
    w = torch.from_numpy(sd[f"{prefix}.0.weight"])
    b = torch.from_numpy(sd[f"{prefix}.0.bias"])
    x = F.conv2d(x, w, b, padding=1)
    x = F.batch_norm(
        x,
        torch.from_numpy(sd[f"{prefix}.1.running_mean"]),
        torch.from_numpy(sd[f"{prefix}.1.running_var"]),
        torch.from_numpy(sd[f"{prefix}.1.weight"]),
        torch.from_numpy(sd[f"{prefix}.1.bias"]),
        training=False,
        eps=1e-5,
    )
    return F.relu(x)


def torch_segnet_eval(canvas_nchw, sd):
    x = torch_cbr(canvas_nchw, sd, "encoder_decoder.down1.conv1.cbr_unit")
    x = torch_cbr(x, sd, "encoder_decoder.down1.conv2.cbr_unit")
    s1 = x.size()
    x, i1 = F.max_pool2d(x, 2, 2, return_indices=True)
    x = torch_cbr(x, sd, "encoder_decoder.down2.conv1.cbr_unit")
    x = torch_cbr(x, sd, "encoder_decoder.down2.conv2.cbr_unit")
    s2 = x.size()
    x, i2 = F.max_pool2d(x, 2, 2, return_indices=True)
    x = F.max_unpool2d(x, i2, 2, 2, output_size=s2)
    x = torch_cbr(x, sd, "encoder_decoder.up2.conv1.cbr_unit")
    x = torch_cbr(x, sd, "encoder_decoder.up2.conv2.cbr_unit")
    x = F.max_unpool2d(x, i1, 2, 2, output_size=s1)
    x = torch_cbr(x, sd, "encoder_decoder.up1.conv1.cbr_unit")
    x = torch_cbr(x, sd, "encoder_decoder.up1.conv2.cbr_unit")
    w = torch.from_numpy(sd["encoder_decoder.regressor.weight"])
    b = torch.from_numpy(sd["encoder_decoder.regressor.bias"])
    return F.conv2d(x, w, b, padding=1)


def randomized_variables(cfg, rng, seed=0):
    """Init the model then randomize batch-norm stats/affine so BN parity is
    actually exercised (fresh init is mean 0 / var 1 / scale 1 / bias 0)."""
    model, variables = init_model(cfg, seed=seed)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    def walk(p, s):
        for k in list(p.keys()):
            if k == "bn" or k == "norm":
                c = p[k]["scale"].shape[0]
                p[k]["scale"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
                p[k]["bias"] = rng.normal(0, 0.2, c).astype(np.float32)
                s[k]["mean"] = rng.normal(0, 0.2, c).astype(np.float32)
                s[k]["var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
            elif isinstance(p[k], dict):
                walk(p[k], s.get(k, {}) if isinstance(s, dict) else {})

    walk(variables["params"], variables["batch_stats"])
    return model, variables


def make_batch(cfg, rng, b=2, n=600):
    pts = rng.uniform(size=(b, n, cfg.input_features)).astype(np.float32)
    lo = np.array(cfg.pc_range[:3]) - 0.5
    hi = np.array(cfg.pc_range[3:]) + 0.5
    pts[..., :3] = pts[..., :3] * (hi - lo) + lo
    return pts


def oracle_forward(cfg, sd, pts_b, use_norm=False):
    """Full end-to-end oracle: numpy voxelize/decorate/pfn/scatter + torch segnet."""
    canvases = []
    for pts in pts_b:
        v, c, n = voxelize_oracle(
            pts, cfg.voxel_size, cfg.pc_range, cfg.max_points_voxel,
            cfg.max_voxels)
        dec = decorate_oracle(v, n, c[:, [2, 1]], cfg.voxel_size, cfg.pc_range,
                              cfg.with_distance)
        assert not use_norm
        w = sd["voxel_feature_extractor.pfn_layers.0.linear.weight"].T
        b = sd["voxel_feature_extractor.pfn_layers.0.linear.bias"]
        feats = pfn_forward_oracle(dec, w, b, cfg.max_points_voxel, n)
        canvases.append(
            scatter_canvas_oracle(feats, c, len(c), cfg.ny, cfg.nx))
    canvas = np.stack(canvases).astype(np.float32)
    out = torch_segnet_eval(
        torch.from_numpy(canvas).permute(0, 3, 1, 2), sd)
    return out.squeeze(1).numpy()  # (B, ny, nx)


@pytest.mark.slow
def test_model_matches_full_oracle(rng):
    model, variables = randomized_variables(CFG, rng)
    sd = export_torch_state_dict(variables, CFG)
    pts = make_batch(CFG, rng)

    want = oracle_forward(CFG, sd, pts)

    pb = pz.pillarize_batch(
        jnp.asarray(pts), pz.PillarGeometry.from_config(CFG),
        CFG.max_points_voxel, CFG.max_voxels)
    got = model.apply(
        variables, pb.voxels, pb.coors, pb.num_points, pb.mask, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_fused_path_matches_pillar_path(rng):
    model, variables = randomized_variables(CFG, rng)
    pts = make_batch(CFG, rng)
    pb = pz.pillarize_batch(
        jnp.asarray(pts), pz.PillarGeometry.from_config(CFG),
        CFG.max_points_voxel, CFG.max_voxels)
    ref = model.apply(
        variables, pb.voxels, pb.coors, pb.num_points, pb.mask, train=False)
    fused = model.apply(
        variables, jnp.asarray(pts), train=False,
        method=GroundEstimatorNet.fused)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_path_matches_pillar_path_use_norm(rng):
    cfg = CFG.replace(use_norm=True)
    model, variables = randomized_variables(cfg, rng, seed=3)
    pts = make_batch(cfg, rng)
    pb = pz.pillarize_batch(
        jnp.asarray(pts), pz.PillarGeometry.from_config(cfg),
        cfg.max_points_voxel, cfg.max_voxels)
    ref = model.apply(
        variables, pb.voxels, pb.coors, pb.num_points, pb.mask, train=False)
    fused = model.apply(
        variables, jnp.asarray(pts), train=False,
        method=GroundEstimatorNet.fused)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_state_dict_roundtrip(rng):
    model, variables = randomized_variables(CFG, rng)
    sd = export_torch_state_dict(variables, CFG)
    back = import_torch_state_dict(sd, CFG)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), flat_b[path])


def test_train_mode_runs_and_updates_stats(rng):
    model, variables = init_model(CFG)
    pts = make_batch(CFG, rng)
    pb = pz.pillarize_batch(
        jnp.asarray(pts), pz.PillarGeometry.from_config(CFG),
        CFG.max_points_voxel, CFG.max_voxels)
    out, mutated = model.apply(
        variables, pb.voxels, pb.coors, pb.num_points, pb.mask, train=True,
        mutable=["batch_stats"])
    assert out.shape == (2, CFG.ny, CFG.nx)
    before = variables["batch_stats"]["encoder_decoder"]["down1"]["conv1"]["bn"]["mean"]
    after = mutated["batch_stats"]["encoder_decoder"]["down1"]["conv1"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_pfn_use_norm_train_matches_torch_and_bounds_divisor_deviation(rng):
    """use_norm=True train-mode BN pinned against torch BatchNorm1d,
    REFERENCE-EXACT with the dynamic divisor.

    The reference normalizes the dynamic (M_actual, P, C) pillar tensor
    (modules/pointpillars.py:55 — BatchNorm1d over M_actual*P rows).  Our
    fixed-shape path carries a `pillar_mask`: sums run over real pillars'
    rows only and the divisor is the traced M_actual*P scalar, so the
    statistics ARE the reference's.  This test proves, with one torch
    oracle on each tensor:

      a. without a mask, our BN MATH is exactly torch's on the SAME padded
         tensor (output + running-stat update, up to torch's
         Bessel-corrected running var — PARITY.md's flax footnote);
      b. WITH the pillar mask, our output and running stats match torch on
         the reference's dynamic tensor at ~1e-5 (VERDICT r4 item 3);
      c. the old static-divisor behavior (mask-less at partial fill) is
         measurably different — the regression guard that the mask path
         actually changes the statistics.
    """
    units, cin, P = 32, 9, 20
    m_actual, m_total = 40, 64
    n_s, n_d = m_total * P, m_actual * P

    counts = rng.integers(1, P + 1, size=m_actual)
    dec = np.zeros((m_total, P, cin), np.float32)
    for i, c in enumerate(counts):
        dec[i, :c] = rng.normal(size=(c, cin)).astype(np.float32)

    w = rng.normal(0, 0.3, size=(cin, units)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, units).astype(np.float32)
    bias = rng.normal(0, 0.2, units).astype(np.float32)
    rm0 = rng.normal(0, 0.2, units).astype(np.float32)
    rv0 = rng.uniform(0.5, 1.5, units).astype(np.float32)

    def torch_pfn(x_np):
        """Fresh torch PFNLayer forward in train mode; returns
        (pillar max (M, units), running_mean, running_var)."""
        lin = torch.nn.Linear(cin, units, bias=False)
        bn = torch.nn.BatchNorm1d(units, eps=1e-3, momentum=0.01)
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(w.T))
            bn.weight.copy_(torch.from_numpy(scale))
            bn.bias.copy_(torch.from_numpy(bias))
            bn.running_mean.copy_(torch.from_numpy(rm0))
            bn.running_var.copy_(torch.from_numpy(rv0))
        bn.train()
        with torch.no_grad():
            z = lin(torch.from_numpy(x_np))
            z = bn(z.permute(0, 2, 1)).permute(0, 2, 1)
            out = F.relu(z).max(dim=1)[0]
        return (out.numpy(), bn.running_mean.numpy().copy(),
                bn.running_var.numpy().copy())

    from gndnet_tpu.models.pfn import PFNLayer

    layer = PFNLayer(out_channels=units, use_norm=True, last_layer=True)
    variables = {
        "params": {"linear": {"kernel": jnp.asarray(w)},
                   "norm": {"scale": jnp.asarray(scale),
                            "bias": jnp.asarray(bias)}},
        "batch_stats": {"norm": {"mean": jnp.asarray(rm0),
                                 "var": jnp.asarray(rv0)}},
    }
    ours3, mut = layer.apply(variables, jnp.asarray(dec), train=True,
                             mutable=["batch_stats"])
    ours = np.asarray(ours3)[:, 0]                       # (m_total, units)

    # (a) same padded tensor -> bit-level agreement with torch
    want_pad, rm_t, rv_t = torch_pfn(dec)
    np.testing.assert_allclose(ours, want_pad, rtol=1e-5, atol=1e-6)

    z = (dec.reshape(-1, cin) @ w).astype(np.float32)    # (n_s, units)
    bm = z.mean(axis=0)
    bv = np.square(z).mean(axis=0) - np.square(bm)       # biased
    got_rm = np.asarray(mut["batch_stats"]["norm"]["mean"])
    got_rv = np.asarray(mut["batch_stats"]["norm"]["var"])
    np.testing.assert_allclose(got_rm, 0.99 * rm0 + 0.01 * bm,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rm_t, got_rm, rtol=1e-5, atol=1e-6)
    # torch's running var carries the Bessel correction (unbiased batch
    # var); flax stores the biased one — a 1/(n-1) relative difference
    # (~8e-4 here, ~1e-6 at real kitti_sem sizes), documented PARITY #6
    np.testing.assert_allclose(got_rv, 0.99 * rv0 + 0.01 * bv,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        rv_t, 0.99 * rv0 + 0.01 * bv * n_s / (n_s - 1), rtol=1e-5, atol=1e-6)

    # (b) REFERENCE-EXACT: pillar_mask -> dynamic divisor -> torch on the
    # dynamic (m_actual, P, C) tensor, output AND running stats
    want_dyn, rm_d, rv_d = torch_pfn(dec[:m_actual])
    pmask = jnp.arange(m_total) < m_actual
    ours_dyn3, mut_d = layer.apply(
        variables, jnp.asarray(dec), train=True, pillar_mask=pmask,
        mutable=["batch_stats"])
    ours_dyn = np.asarray(ours_dyn3)[:, 0]
    np.testing.assert_allclose(ours_dyn[:m_actual], want_dyn,
                               rtol=1e-4, atol=1e-5)
    zd = z.reshape(m_total, P, units)[:m_actual].reshape(-1, units)
    md = zd.mean(axis=0)
    vd = np.square(zd).mean(axis=0) - np.square(md)
    np.testing.assert_allclose(
        np.asarray(mut_d["batch_stats"]["norm"]["mean"]),
        0.99 * rm0 + 0.01 * md, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rm_d, 0.99 * rm0 + 0.01 * md,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mut_d["batch_stats"]["norm"]["var"]),
        0.99 * rv0 + 0.01 * vd, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        rv_d, 0.99 * rv0 + 0.01 * vd * n_d / (n_d - 1), rtol=1e-5, atol=1e-6)

    # (c) regression guard: the mask-less static divisor at fill=0.625
    # dilutes statistics by ~sqrt(fill) — measurably different output.
    # If this stops differing the mask path silently became a no-op.
    dev = np.max(np.abs(ours[:m_actual] - want_dyn))
    assert dev > 0.5, f"static-divisor delta vanished: {dev}"


@pytest.mark.slow
def test_multi_layer_pfn_forward_and_grad(rng):
    """vfe_filters with >1 layer (the reference supports stacks via
    pfn_layers, pointpillars.py:97-107): pillar path forward + gradients."""
    cfg = CFG.replace(vfe_filters=(32, 64))
    model, variables = init_model(cfg)
    pts = make_batch(cfg, rng)
    pb = pz.pillarize_batch(
        jnp.asarray(pts), pz.PillarGeometry.from_config(cfg),
        cfg.max_points_voxel, cfg.max_voxels)
    out = model.apply(variables, pb.voxels, pb.coors, pb.num_points, pb.mask,
                      train=False)
    assert out.shape == (2, cfg.ny, cfg.nx)
    assert np.isfinite(np.asarray(out)).all()
    # intermediate layer emits units//2 then concatenates the max (2*16=32 in)
    k0 = variables["params"]["voxel_feature_extractor"]["pfn_0"]["linear"]["kernel"]
    k1 = variables["params"]["voxel_feature_extractor"]["pfn_1"]["linear"]["kernel"]
    assert k0.shape == (cfg.num_decorated_features, 16)
    assert k1.shape == (32, 64)

    def loss(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        return jnp.sum(model.apply(v, pb.voxels, pb.coors, pb.num_points,
                                   pb.mask, train=False) ** 2)

    g = jax.grad(loss)(variables["params"])
    gn = np.asarray(jnp.linalg.norm(
        g["voxel_feature_extractor"]["pfn_0"]["linear"]["kernel"]))
    assert np.isfinite(gn) and gn > 0
