"""gndnet_tpu: a TPU-native (JAX/XLA/Pallas) ground-estimation framework.

A from-scratch rebuild of the capabilities of pem-gini/GndNet (IROS 2020):
LiDAR scan -> pillarization -> pillar feature net -> pseudo-image ->
conv encoder-decoder -> per-cell ground elevation -> per-point segmentation,
plus the surrounding framework: data pipeline, ground-truth generation,
augmentation, training, evaluation, streaming inference, checkpointing,
and multi-chip sharding.
"""

from gndnet_tpu.config import (
    AugmentationConfig,
    DataPrepConfig,
    GndNetConfig,
    load_config,
)

__version__ = "0.1.0"

__all__ = [
    "AugmentationConfig",
    "DataPrepConfig",
    "GndNetConfig",
    "load_config",
]
