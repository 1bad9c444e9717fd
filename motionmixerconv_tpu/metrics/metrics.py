"""Losses and evaluation metrics, TPU-first.

JAX equivalents of the reference metric suite (h36m/utils/utils_mixer.py).
Every metric is a pure function over batched arrays; the reference's Python
loops (the 299-threshold PCK sweep at utils_mixer.py:36-45 and the cumulative
delta decode at :165-175) are replaced with one broadcast and one ``cumsum``
respectively, so each metric is a single fused XLA computation.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.rotations import expmap2rotmat, rotmat2euler


def mpjpe_error(batch_pred: jnp.ndarray, batch_gt: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint position error.

    Parity with reference ``mpjpe_error`` (h36m/utils/utils_mixer.py:48-53):
    mean L2 over all (..., 3) joint coordinates.
    """
    diff = (batch_gt - batch_pred).reshape(-1, 3)
    return jnp.mean(jnp.linalg.norm(diff, axis=-1))


def pck(
    predictions: jnp.ndarray, targets: jnp.ndarray, thresh: jnp.ndarray
) -> jnp.ndarray:
    """Percentage of correct keypoints within ``thresh``.

    Parity with reference ``pck`` (h36m/utils/utils_mixer.py:20-34); accepts a
    scalar or a (T,) vector of thresholds (broadcast, returning (T,)).
    """
    dist = jnp.sqrt(jnp.sum((predictions - targets) ** 2, axis=-1))  # (..., J)
    thresh = jnp.asarray(thresh)
    if thresh.ndim == 0:
        return jnp.mean((dist <= thresh).astype(jnp.float32))
    # (T, ...) broadcast: one pass over all thresholds.
    ok = dist[None, ...] <= thresh.reshape((-1,) + (1,) * dist.ndim)
    return jnp.mean(ok.astype(jnp.float32), axis=tuple(range(1, dist.ndim + 1)))


def _auc_suffix_weights() -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precomputed threshold grid + suffix trapz weights for AUC-PCK.

    The reference integrates mean(1[d <= t]) over the 299-point grid with
    trapz (utils_mixer.py:36-45). Since the integrand is linear in the
    per-distance indicators, AUC == mean_d W[k(d)] / 0.299 with
    W[k] = sum_{i>=k} w_i (trapz weights) and k(d) the first grid index with
    t_k >= d — an O(log T) searchsorted per distance instead of a
    T x |distances| broadcast.
    """
    grid = jnp.arange(0.001, 0.3, 0.001, dtype=jnp.float32)  # (299,)
    w = jnp.full((299,), 0.001, dtype=jnp.float32)
    w = w.at[0].set(0.0005).at[-1].set(0.0005)
    suffix = jnp.concatenate(
        [jnp.cumsum(w[::-1])[::-1], jnp.zeros((1,), jnp.float32)]
    )  # (300,), suffix[299] = 0
    return grid, suffix


def auc_pck_from_dist(dist: jnp.ndarray, axis=None) -> jnp.ndarray:
    """AUC-PCK from joint distances, exact trapz value.

    ``axis=None`` averages over every distance (the reference's batch-mean);
    a tuple averages over those axes only (e.g. per-sample curves).
    """
    grid, suffix = _auc_suffix_weights()
    # k = searchsorted(grid, dist, side='left') == #(grid < dist), computed as
    # a fused broadcast-count: identical result, ~5x faster than XLA's
    # binary-search lowering on TPU (12.2 -> 2.6 ms at 140k distances).
    # Counting NOT(dist <= grid) keeps searchsorted's NaN semantics: a NaN
    # distance lands in the terminal bucket (zero credit), not bucket 0.
    k = jnp.sum(~(dist[..., None] <= grid), axis=-1)
    return jnp.mean(suffix[k], axis=axis) / 0.299


def auc_pck_metric(predictions: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """AUC of the PCK curve over thresholds 0.001..0.3 (step 0.001).

    Parity with reference ``auc_pck_metric`` (h36m/utils/utils_mixer.py:36-45),
    computed via the closed-form suffix-weight lookup (see
    ``_auc_suffix_weights``) instead of the reference's 299-iteration loop.
    """
    dist = jnp.sqrt(jnp.sum((predictions - targets) ** 2, axis=-1))
    return auc_pck_from_dist(dist)


def joint_angle_error(ang_pred: jnp.ndarray, ang_gt: jnp.ndarray) -> jnp.ndarray:
    """Mean L2 error in angle space (h36m/utils/utils_mixer.py:55-57)."""
    return jnp.mean(jnp.linalg.norm(ang_gt - ang_pred, axis=-1))


def euler_error(ang_pred: jnp.ndarray, ang_gt: jnp.ndarray) -> jnp.ndarray:
    """Euler-angle error through the full rotation-conversion chain.

    Parity with reference ``euler_error`` (h36m/utils/utils_mixer.py:59-73):
    expmap -> rotmat -> euler on predictions and targets, then mean L2 over
    per-frame flattened euler vectors.
    """
    dim_full_len = ang_gt.shape[2]
    pred = ang_pred.reshape(-1, 3)
    targ = ang_gt.reshape(-1, 3)
    pred_eul = rotmat2euler(expmap2rotmat(pred)).reshape(-1, dim_full_len)
    targ_eul = rotmat2euler(expmap2rotmat(targ)).reshape(-1, dim_full_len)
    return jnp.mean(jnp.linalg.norm(pred_eul - targ_eul, axis=1))


def l1_angle_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Training loss for the angle path.

    Parity with the inline expression at h36m/train_mixer_h36m.py:185:
    ``mean(sum(abs(pred - gt), dim=2))`` over (B, T, D) sequences.
    """
    return jnp.mean(jnp.sum(jnp.abs(pred - gt), axis=2))


def delta_2_gt(prediction: jnp.ndarray, last_timestep: jnp.ndarray) -> jnp.ndarray:
    """Decode velocity (delta) predictions into absolute poses.

    Parity with reference ``delta_2_gt`` (h36m/utils/utils_mixer.py:165-175);
    the sequential Python accumulation is an exclusive prefix sum here:
    ``out[t] = last + sum(pred[0..t])``.
    """
    return last_timestep[:, None, :] + jnp.cumsum(prediction, axis=1)


def criterion_cos(input_f: jnp.ndarray, target_f: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity over axis 2 (h36m/utils/utils_mixer.py:10-13, unused
    by the reference training paths but part of its metric surface)."""
    return _cosine(input_f, target_f, axis=2)


def criterion_cos2(input_f: jnp.ndarray, target_f: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity over axis 1 (h36m/utils/utils_mixer.py:15-17)."""
    return _cosine(input_f, target_f, axis=1)


def _cosine(a: jnp.ndarray, b: jnp.ndarray, axis: int, eps: float = 1e-6) -> jnp.ndarray:
    # torch CosineSimilarity clamps each norm at eps
    na = jnp.maximum(jnp.linalg.norm(a, axis=axis), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=axis), eps)
    return jnp.sum(a * b, axis=axis) / (na * nb)
