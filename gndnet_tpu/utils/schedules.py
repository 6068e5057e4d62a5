"""Learning-rate schedules.

`step_lr` reproduces the live reference schedule (torch StepLR(step_size=15,
gamma=0.8), reference: training.py:100).  The rest subsume the dormant
torchplus schedule library (reference: torchplus/train/learning_schedules.py:
6-178): constant, manual stepping, exponential decay with burn-in, and cosine
decay with warmup — expressed as optax-compatible `step -> lr` callables.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def step_lr(base_lr: float, step_size_epochs: int, gamma: float,
            steps_per_epoch: int):
    """lr = base * gamma ** (epoch // step_size); epoch derived from step."""
    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * gamma ** (epoch // step_size_epochs)
    return schedule


def constant_lr(base_lr: float):
    return lambda step: jnp.asarray(base_lr, jnp.float32)


def manual_stepping(boundaries: Sequence[int], rates: Sequence[float]):
    """Piecewise-constant rates switching at step `boundaries`
    (torchplus ManualStepping semantics: len(rates) == len(boundaries) + 1)."""
    if len(rates) != len(boundaries) + 1:
        raise ValueError("need len(rates) == len(boundaries) + 1")
    b = jnp.asarray(boundaries)
    r = jnp.asarray(rates, jnp.float32)

    def schedule(step):
        idx = jnp.sum(step >= b)
        return r[idx]
    return schedule


def exponential_decay_with_burnin(base_lr: float, decay_steps: int,
                                  decay_factor: float,
                                  burnin_learning_rate: float = 0.0,
                                  burnin_steps: int = 0,
                                  staircase: bool = True):
    """torchplus ExponentialDecayWithBurnin: constant low rate for
    `burnin_steps`, then exponential decay."""
    def schedule(step):
        exp = step / decay_steps
        if staircase:
            exp = jnp.floor(exp)
        post = base_lr * decay_factor ** exp
        if burnin_steps == 0:
            return post
        return jnp.where(step < burnin_steps, burnin_learning_rate, post)
    return schedule


def cosine_decay_with_warmup(base_lr: float, total_steps: int,
                             warmup_learning_rate: float = 0.0,
                             warmup_steps: int = 0,
                             hold_base_rate_steps: int = 0):
    """torchplus CosineDecayWithWarmup: linear warmup, optional hold, then
    cosine decay to zero."""
    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        cos = 0.5 * base_lr * (
            1 + jnp.cos(
                math.pi
                * jnp.clip(s - warmup_steps - hold_base_rate_steps, 0.0, None)
                / max(total_steps - warmup_steps - hold_base_rate_steps, 1)
            )
        )
        lr = jnp.where(
            s < warmup_steps + hold_base_rate_steps,
            jnp.asarray(base_lr, jnp.float32), cos,
        )
        if warmup_steps > 0:
            slope = (base_lr - warmup_learning_rate) / warmup_steps
            warm = slope * s + warmup_learning_rate
            lr = jnp.where(s < warmup_steps, warm, lr)
        return lr
    return schedule
