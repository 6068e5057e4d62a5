"""Analytic FLOPs/bytes model + MFU/roofline accounting for bench.py.

The reference never states utilization (its claim is a bare 55 Hz,
README.md:15); a per-chip Hz number alone does not transfer across
hardware.  This module prices one scan's forward pass in the two
currencies that do — MXU FLOPs and HBM bytes — so every bench JSON can
report achieved TF/s, achieved GB/s, and MFU against the chip's peaks.

Conventions (documented so the numbers are auditable):

* FLOPs count multiply-accumulates as 2 ops; only the two matmul-shaped
  stages are priced (PFN linear + the 9-conv SegNet stack via
  models.segnet.segnet_stage_shapes).  Elementwise work (decoration, BN,
  relu, pooling, thresholding) adds <1% FLOPs and is fused by XLA; the
  sort is 0 FLOPs (comparisons).  This matches how MFU is conventionally
  quoted for conv/transformer models.
* Bytes are a LOWER BOUND on HBM traffic assuming perfect fusion: each
  logical tensor crosses HBM once per producer/consumer pair that XLA
  cannot keep in registers/VMEM.  The in-VMEM Pallas sort counts one HBM
  round-trip (its ~log^2(N) internal stages ride VMEM — which is why the
  frontend can be VPU-bound without being HBM-bound; see
  docs/KERNELS.md roofline).
* Peaks are per-chip datasheet numbers keyed on jax device_kind, bf16
  MXU peak + HBM bandwidth.  f32 runs are still scored against the bf16
  peak (the MXU has no separate f32 mode; XLA synthesizes f32 matmuls
  from multiple bf16 passes), so f32 MFU reads low by design — noted in
  the emitted dict.
"""

from __future__ import annotations

# (bf16 peak FLOP/s, HBM bytes/s) per chip generation; matched by
# substring against jax.devices()[0].device_kind.  v5e: 197 bf16 TFLOPs,
# 819 GB/s (public datasheet).
_PEAKS = {
    "v5 lite": (197e12, 819e9),
    "v5e": (197e12, 819e9),
    "v4": (275e12, 1228e9),
    "v5p": (459e12, 2765e9),
    "v6": (918e12, 1640e9),
}
_DEFAULT_PEAK = (197e12, 819e9)   # assume v5e when unrecognized


def chip_peaks(device_kind: str | None = None):
    """(peak_flops_per_s, peak_hbm_bytes_per_s, kind) for this chip."""
    if device_kind is None:
        import jax

        device_kind = jax.devices()[0].device_kind
    kind_l = device_kind.lower()
    for key, peaks in _PEAKS.items():
        if key in kind_l:
            return peaks + (device_kind,)
    return _DEFAULT_PEAK + (device_kind,)


def model_flops_per_scan(cfg) -> float:
    """Matmul-shaped forward FLOPs for ONE scan (MACs x 2).

    PFN linear: num_points x decorated_features x C (the affine
    decomposition runs the same matmul on the raw stream).  SegNet: the
    9-conv stack at (ny, nx) per segnet_stage_shapes — 3x3 kernels, so
    9 x h x w x cin x cout MACs each.
    """
    from gndnet_tpu.models.segnet import segnet_stage_shapes

    c = cfg.vfe_filters[-1]
    flops = 2.0 * cfg.num_points * cfg.num_decorated_features * c
    for h, w, cin, cout in segnet_stage_shapes(cfg.ny, cfg.nx, c):
        flops += 2.0 * 9.0 * h * w * cin * cout
    return flops


def min_hbm_bytes_per_scan(cfg) -> dict:
    """Perfect-fusion lower bound on HBM bytes for ONE served scan,
    itemized by stage (serving dtype: bf16 activations, f32 points/ids).

    frontend: raw points read (binning + decoration gather read them
    twice), packed sort keys one round-trip (in-VMEM bitonic), the sorted
    decorated stream written + read by the mega-kernel, canvas written.
    segnet: every conv reads its input and writes its output once (BN/relu
    fuse); pool/unpool indices ride along (i32 at half resolution).
    postproc: per-point elevation lookup + label write.
    """
    n = cfg.num_points
    f = cfg.input_features
    a = cfg.num_decorated_features
    c = cfg.vfe_filters[-1]
    act = 2                                   # bf16 activation bytes
    frontend = (
        4 * n * f          # points read for binning
        + 4 * n            # cell ids written
        + 2 * 4 * n        # packed sort keys: one HBM round-trip
        + 4 * n * f        # points re-gathered for decoration
        + act * n * a      # decorated stream written
        + act * n * a      # ... read by the scan kernel
        + act * cfg.ny * cfg.nx * c   # canvas written
    )
    from gndnet_tpu.models.segnet import segnet_stage_shapes

    segnet = 0
    for h, w, cin, cout in segnet_stage_shapes(cfg.ny, cfg.nx, c):
        segnet += act * h * w * (cin + cout)
    # two pool index maps (i32, at the pooled resolutions), written + read
    segnet += 2 * 4 * (cfg.ny // 2) * (cfg.nx // 2) * 128
    segnet += 2 * 4 * (cfg.ny // 4) * (cfg.nx // 4) * 256
    post = 4 * n * 3 + 4 * cfg.ny * cfg.nx + n   # xyz read, map read, labels
    return {"frontend": frontend, "segnet": segnet, "postproc": post,
            "total": frontend + segnet + post}


def perf_accounting(cfg, hz: float, batch: int = 1,
                    training: bool = False,
                    device_kind: str | None = None) -> dict:
    """MFU/bandwidth dict for a measured per-scan rate `hz`.

    Emitted into bench JSONs (VERDICT r4 item 1): gflops_per_scan,
    achieved_tflops, mfu_pct (vs the chip's bf16 peak), min_bytes_per_scan
    and the implied achieved_gbps / hbm_pct.  Both utilization figures are
    UPPER bounds on how much headroom remains in their resource — when
    both are low, the binding resource is elsewhere (dispatch, VPU-bound
    sort stages, serialization); docs/KERNELS.md carries the per-stage
    roofline analysis.
    """
    peak_f, peak_b, kind = chip_peaks(device_kind)
    flops = (train_flops_per_scan if training else model_flops_per_scan)(cfg)
    bts = min_hbm_bytes_per_scan(cfg)
    if training:
        # backward re-reads activations and writes gradients: ~3x the
        # forward's minimum traffic (same convention as the FLOPs)
        bts = {k: 3 * v for k, v in bts.items()}
    return {
        "gflops_per_scan": round(flops / 1e9, 2),
        "achieved_tflops": round(hz * flops / 1e12, 2),
        "mfu_pct": round(100.0 * hz * flops / peak_f, 2),
        "min_bytes_per_scan": int(bts["total"]),
        "achieved_gbps": round(hz * bts["total"] / 1e9, 1),
        "hbm_pct": round(100.0 * hz * bts["total"] / peak_b, 2),
        "batch": batch,
        "chip": kind,
        "peak_tflops_bf16": round(peak_f / 1e12, 0),
        "peak_hbm_gbps": round(peak_b / 1e9, 0),
    }


def train_flops_per_scan(cfg) -> float:
    """Training-step FLOPs per scan: forward + backward.  Convention:
    backward of a matmul/conv costs 2x the forward (d_input + d_weights),
    so fwd+bwd = 3x forward for the matmul-shaped stages."""
    return 3.0 * model_flops_per_scan(cfg)
