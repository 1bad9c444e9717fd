"""Autoregressive sliding-window rollout, TPU-first.

Reference semantics (h36m/train_autoreg_mixer_h36m.py:195-258): a model
trained on (input_n_model -> output_n_model) windows is rolled over a longer
(input_n_dataset + output_n_dataset) sequence in ``step_window`` strides; the
per-step losses are summed (normalised by output_n_dataset // step_window)
and a single backward runs through the whole rollout.

TPU mapping:
- teacher forcing: every step's input comes from ground truth, so steps are
  *independent* — all rollout windows are folded into the batch axis and run
  as ONE forward (the reference's sequential loop is S× slower for no reason).
- closed loop: the carried window makes steps sequential. The loop is
  UNROLLED up to UNROLL_MAX_STEPS (n_steps is small and static — 5 in every
  production config; longer rollouts fall back to lax.scan to bound the
  compiled program size):
  reverse-mode through ``lax.scan`` residual-saves and runs a backward scan
  that blocks XLA fusion across step boundaries, measured 3.4x slower than
  the unrolled chain at the production config (probe 10, r3; reproduce: `tools/probe.py ar`: grad
  scan 26.96 ms vs unrolled 7.94 ms per b50 step). Gradients flow through
  the unrolled chain exactly like the reference's single backward through
  its Python loop (train_autoreg_mixer_h36m.py:233-253 — no detach on the
  fed-back predictions).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Closed-loop rollouts up to this many steps are unrolled (measured 3.4x
# faster in reverse-mode than lax.scan at the production n_steps=5,
# `tools/probe.py ar`); longer rollouts use lax.scan to keep the compiled
# program O(1) in n_steps (an unrolled chain embeds n_steps forward+backward
# model copies per scan-epoch step — minutes-scale remote compiles).
UNROLL_MAX_STEPS = 8


def rollout_starts(
    input_n_dataset: int, output_n_dataset: int, input_n_model: int,
    output_n_model: int, step_window: int,
) -> np.ndarray:
    """Window start offsets of the rollout (train_autoreg_mixer_h36m.py:218-222)."""
    if output_n_dataset % step_window != 0:
        raise ValueError("output_n_dataset does not divide by step_window")
    if output_n_dataset // step_window < 1:
        raise ValueError("output_n_dataset is smaller than step_window")
    hi = input_n_dataset + output_n_dataset - input_n_model - output_n_model + 1
    return np.arange(0, hi, step_window)


def autoregressive_rollout(
    apply_fn,
    full_sequence: jnp.ndarray,
    *,
    input_n_model: int,
    output_n_model: int,
    step_window: int,
    teacher_forcing: bool,
    loss_per_sample,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the rollout and return (per_sample_loss, full_prediction).

    Args:
        apply_fn: function (B, input_n_model, D) -> (B, output_n_model, D)
            (the model forward with variables already bound).
        full_sequence: (B, input_n_dataset + output_n_dataset, D) in
            dim_used space.
        loss_per_sample: fn (pred, gt) -> (B,) per-sample loss.
    Returns:
        per_sample_loss: (B,) summed step losses / (output_n_dataset // step_window)
            — matching the reference normalisation (:258).
        full_sequence_predict: (B, n_steps * output_n_model, D) stitched
            predictions (the reference writes each step's output_n_model
            frames at end_frame_train - input_n_model).
    """
    b, total_len, d = full_sequence.shape
    # rollout geometry: the reference assumes input_n_dataset == input_n_model
    # in its prediction-buffer indexing (:238); same assumption here.
    starts = rollout_starts(
        input_n_model, total_len - input_n_model, input_n_model,
        output_n_model, step_window,
    )
    n_steps = len(starts)
    n_norm = (total_len - input_n_model) // step_window

    # per-step ground-truth targets: (S, B, output_n_model, D)
    gt_steps = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(
                full_sequence, int(s) + input_n_model, output_n_model, axis=1
            )
            for s in starts
        ]
    )

    if teacher_forcing:
        # independent steps -> fold into the batch axis, one big forward.
        in_steps = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(
                    full_sequence, int(s), input_n_model, axis=1
                )
                for s in starts
            ]
        )  # (S, B, in_m, D)
        preds = apply_fn(in_steps.reshape(n_steps * b, input_n_model, d))
        preds = preds.reshape(n_steps, b, output_n_model, d)
        per_step = jnp.stack(
            [loss_per_sample(preds[s], gt_steps[s]) for s in range(n_steps)]
        )  # (S, B)
        per_sample = jnp.sum(per_step, axis=0) / n_norm
        # stitch with the reference's overwrite semantics (:238-239): step s
        # writes its output_n_model frames at offset starts[s]; overlapping
        # writes resolve to the later step.
        full_predict = jnp.zeros((b, total_len - input_n_model, d), full_sequence.dtype)
        for s in range(n_steps):
            full_predict = jax.lax.dynamic_update_slice_in_dim(
                full_predict, preds[s], int(starts[s]), axis=1
            )
        return per_sample, full_predict

    # closed loop: carry the input window through an UNROLLED chain (see
    # module docstring for the measured scan-vs-unroll adjudication).
    if input_n_model - step_window + output_n_model != input_n_model:
        raise ValueError(
            "closed-loop rollout requires output_n_model == step_window "
            "(the reference feedback concat keeps the window length fixed, "
            "train_autoreg_mixer_h36m.py:241-253)"
        )
    window = full_sequence[:, :input_n_model]
    if n_steps <= UNROLL_MAX_STEPS:
        losses = []
        preds = []
        for s in range(n_steps):
            pred = apply_fn(window)
            losses.append(loss_per_sample(pred, gt_steps[s]))
            preds.append(pred)
            window = jnp.concatenate([window[:, step_window:], pred], axis=1)
        per_sample = sum(losses) / n_norm
        full_predict = jnp.concatenate(preds, axis=1)
        return per_sample, full_predict

    # long rollouts: unrolling would inline n_steps forward+backward model
    # copies into the (epoch-scanned) program and blow up remote-compile
    # time, so fall back to lax.scan — O(1) program size, ~3.4x slower
    # reverse-mode at the production n_steps=5 (which stays unrolled).
    def step(carry, gt):
        pred = apply_fn(carry)
        new_window = jnp.concatenate([carry[:, step_window:], pred], axis=1)
        return new_window, (loss_per_sample(pred, gt), pred)

    _, (losses, preds) = jax.lax.scan(step, window, gt_steps)
    per_sample = jnp.sum(losses, axis=0) / n_norm
    full_predict = jnp.moveaxis(preds, 0, 1).reshape(
        b, n_steps * output_n_model, d
    )
    return per_sample, full_predict
