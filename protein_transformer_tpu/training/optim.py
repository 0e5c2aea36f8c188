"""Optimizers and learning-rate schedules (optax).

Parity targets:
* Noam schedule: lr = d_model^-0.5 * min(step^-0.5, warmup^-1.5 * step),
  step counting from 1 (reference: models/transformer/Optimizer.py:31-46).
* Adam(betas=(0.9, 0.98), eps=1e-9) / SGD, with an optional L2 weight decay
  of 1e-2 added to the gradient before the moment update, matching torch's
  coupled weight_decay semantics (reference: train.py:371-381).
* ReduceLROnPlateau: host-side state machine with torch semantics (mode=min,
  factor=0.1, relative threshold), driving a scale factor that multiplies
  the base lr (reference: train.py:388-392).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import optax


def noam_schedule(d_model: int, warmup_steps: int) -> optax.Schedule:
    init_lr = float(d_model) ** -0.5
    wu = float(warmup_steps) ** -1.5

    def schedule(count):
        if isinstance(count, (int, float)):
            # host path (metric logging): plain python arithmetic -- a jnp
            # version here would dispatch device ops + a D2H round trip per
            # logged batch
            step = float(max(count + 1, 1))
            return init_lr * min(step ** -0.5, wu * step)
        step = jnp.maximum(count + 1, 1).astype(jnp.float32)
        return init_lr * jnp.minimum(step ** -0.5, wu * step)

    return schedule


def make_optimizer(optimizer: str, learning_rate, weight_decay: bool,
                   clip: float | None) -> optax.GradientTransformation:
    """learning_rate: float or optax schedule."""
    wd = 1e-2 if weight_decay else 0.0
    parts = []
    if clip:
        parts.append(optax.clip_by_global_norm(clip))
    if wd:
        # torch couples weight decay into the gradient before Adam's moments.
        parts.append(optax.add_decayed_weights(wd))
    if optimizer == "adam":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-9))
    elif optimizer == "sgd":
        pass  # plain gradient
    else:
        raise ValueError(f"Unknown optimizer {optimizer}")
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


@dataclasses.dataclass
class PlateauState:
    """torch.optim.lr_scheduler.ReduceLROnPlateau with default mode='min',
    factor=0.1, threshold_mode='rel' (reference: train.py:388-392)."""
    patience: int
    threshold: float
    factor: float = 0.1
    best: float = float("inf")
    num_bad_epochs: int = 0
    scale: float = 1.0

    def step(self, metric: float) -> float:
        """Update with an epoch metric; returns the current lr scale."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.scale *= self.factor
            self.num_bad_epochs = 0
        return self.scale

    def state_dict(self) -> dict:
        return dataclasses.asdict(self)

    def load_state_dict(self, d: dict) -> None:
        for k, v in d.items():
            setattr(self, k, v)


@dataclasses.dataclass
class EarlyStopping:
    """Early-stopping tracker (reference: log.py:92-112): stop when the
    monitored metric hasn't improved by more than `threshold` for more than
    `patience` epochs."""
    patience: int
    threshold: float
    best: float = float("inf")
    epoch_last_improved: int = -1

    def update(self, epoch: int, metric: float) -> bool:
        """Returns True if training should stop."""
        if self.best - metric > self.threshold:
            self.best = metric
            self.epoch_last_improved = epoch
            return False
        return (self.patience > 0
                and epoch - self.epoch_last_improved > self.patience)

    def state_dict(self) -> dict:
        return dataclasses.asdict(self)

    def load_state_dict(self, d: dict) -> None:
        for k, v in d.items():
            setattr(self, k, v)
