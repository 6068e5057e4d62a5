"""Logging and metric utilities.

* `setup_logger` — hierarchical stdlib logger with the reference's timestamped
  file+console format (reference: training.py:44-53).
* `AverageMeter` — batch-time/data-time/loss running averages
  (reference: training.py:320-335).
* streaming metric accumulators subsuming torchplus.metrics
  (reference: torchplus/metrics.py:7-281): Scalar, Accuracy, PrecisionRecall.
* `parse_log_file` / epoch summaries — offline log analytics equivalent to
  the reference's regex parser (reference: scripts/log_parser.py:14-87).
"""

from __future__ import annotations

import logging
import re
from collections import defaultdict


def setup_logger(name: str = "main", log_file: str | None = None,
                 level=logging.DEBUG) -> logging.Logger:
    formatter = logging.Formatter(
        "%(asctime)s | %(levelname)s | %(name)s | %(message)s"
    )
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False  # avoid duplicate lines via the root logger
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        sh = logging.StreamHandler()
        sh.setFormatter(formatter)
        logger.addHandler(sh)
    if log_file and not any(
        isinstance(h, logging.FileHandler)
        and getattr(h, "baseFilename", None) == log_file
        for h in logger.handlers
    ):
        fh = logging.FileHandler(log_file)
        fh.setLevel(level)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


class AverageMeter:
    """Running value/average tracker (reference training.py:320-335)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class Scalar:
    """Streaming scalar mean (torchplus.metrics.Scalar equivalent)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, value, n: int = 1):
        self.total += float(value) * n
        self.count += n

    @property
    def value(self):
        return self.total / max(self.count, 1)

    def clear(self):
        self.total, self.count = 0.0, 0


class Accuracy:
    """Streaming classification accuracy (torchplus.metrics.Accuracy)."""

    def __init__(self):
        self.correct = 0
        self.total = 0

    def update(self, pred, target):
        import numpy as np

        pred = np.asarray(pred)
        target = np.asarray(target)
        self.correct += int(np.sum(pred == target))
        self.total += int(pred.size)

    @property
    def value(self):
        return self.correct / max(self.total, 1)

    def clear(self):
        self.correct = self.total = 0


class PrecisionRecall:
    """Streaming binary precision/recall/IoU from per-frame masks
    (subsumes torchplus.metrics.Precision/Recall; also the accumulator
    pattern of reference evaluate_SemanticKITTI.py:199-208)."""

    def __init__(self):
        self.tp = self.fp = self.fn = 0

    def update(self, pred, target):
        import numpy as np

        pred = np.asarray(pred).astype(bool)
        target = np.asarray(target).astype(bool)
        self.tp += int(np.sum(pred & target))
        self.fp += int(np.sum(pred & ~target))
        self.fn += int(np.sum(~pred & target))

    @property
    def precision(self):
        return self.tp / max(self.tp + self.fp, 1)

    @property
    def recall(self):
        return self.tp / max(self.tp + self.fn, 1)

    @property
    def iou(self):
        return self.tp / max(self.tp + self.fp + self.fn, 1)


def create_run_dir(root: str, prefix: str = "run") -> str:
    """Create and return a timestamped run directory
    (torchplus/train/common.py:5-23 equivalent)."""
    import datetime
    import os

    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    path = os.path.join(root, f"{prefix}-{stamp}")
    os.makedirs(path, exist_ok=True)
    return path


_EPOCH_RE = re.compile(
    r"Epoch:\s*\[(\d+)\]\[(\d+)/(\d+)\].*?Loss\s+([\d.eE+-]+)\s+\(([\d.eE+-]+)\)"
)
_VALID_RE = re.compile(
    r"Test:\s*\[(\d+)/(\d+)\].*?Loss\s+([\d.eE+-]+)\s+\(([\d.eE+-]+)\)"
)


def parse_log_file(path: str) -> dict:
    """Recover per-epoch train/valid loss curves from a training log
    (format emitted by train.py's progress lines, mirroring the reference's
    scripts/log_parser.py)."""
    train = defaultdict(list)
    valid = []
    with open(path) as f:
        for line in f:
            m = _EPOCH_RE.search(line)
            if m:
                train[int(m.group(1))].append(float(m.group(4)))
                continue
            m = _VALID_RE.search(line)
            if m:
                valid.append(float(m.group(4)))
    epochs = sorted(train)
    return {
        "epochs": epochs,
        "train_loss": [sum(train[e]) / len(train[e]) for e in epochs],
        "valid_loss": valid,
    }


def plot_epoch_losses(parsed: dict, out_path: str) -> None:
    """Matplotlib loss-curve plot (reference scripts/log_parser.py:66-87)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.plot(parsed["epochs"], parsed["train_loss"], label="train")
    if parsed["valid_loss"]:
        ax.plot(
            parsed["epochs"][: len(parsed["valid_loss"])],
            parsed["valid_loss"][: len(parsed["epochs"])],
            label="valid",
        )
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    fig.savefig(out_path)
    plt.close(fig)
