"""Optimizer construction matching the reference's torch training setup.

- torch ``optim.Adam(lr, weight_decay=1e-5)`` couples the decay into the
  gradient *before* the moment updates (L2, not AdamW); optax equivalent is
  ``add_decayed_weights`` chained before ``adam`` (SURVEY.md §7 hard parts).
- torch ``MultiStepLR(milestones, gamma)`` steps per *epoch*
  (train_mixer_h36m.py:65-67,248-249); expressed here as a per-step
  piecewise-constant schedule with boundaries at milestone*steps_per_epoch.
- torch ``clip_grad_norm_`` is a global-norm clip applied before the update
  (train_mixer_h36m.py:189-192).
"""

from __future__ import annotations

from typing import Optional, Sequence

import optax


def multistep_schedule(
    lr: float,
    milestones: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    """MultiStepLR as a per-step schedule (milestones are epoch indices)."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(lr, boundaries)


def make_optimizer(
    lr: float,
    weight_decay: float = 1e-5,
    use_scheduler: bool = True,
    milestones: Sequence[int] = (15, 25, 35, 40),
    gamma: float = 0.1,
    steps_per_epoch: int = 1,
    clip_grad: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam + coupled L2 + optional MultiStepLR + optional global-norm clip."""
    schedule = (
        multistep_schedule(lr, milestones, gamma, steps_per_epoch)
        if use_scheduler
        else lr
    )
    parts = []
    if clip_grad is not None:
        parts.append(optax.clip_by_global_norm(clip_grad))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.adam(learning_rate=schedule))
    return optax.chain(*parts)
