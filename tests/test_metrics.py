"""Golden-value parity tests for losses and metrics."""

import os

import jax.numpy as jnp
import numpy as np

from motionmixerconv_tpu.metrics import (
    auc_pck_metric,
    delta_2_gt,
    euler_error,
    joint_angle_error,
    l1_angle_loss,
    mpjpe_error,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load():
    return np.load(os.path.join(GOLDEN, "metrics.npz"))


def test_mpjpe_error():
    g = _load()
    got = mpjpe_error(jnp.asarray(g["pred"]), jnp.asarray(g["gt"]))
    np.testing.assert_allclose(got, g["mpjpe"], rtol=1e-5)


def test_auc_pck():
    g = _load()
    got = auc_pck_metric(
        jnp.asarray(g["pred"]).reshape(-1, 25, 22, 3) / 1000.0,
        jnp.asarray(g["gt"]).reshape(-1, 25, 22, 3) / 1000.0,
    )
    np.testing.assert_allclose(got, g["auc"], rtol=1e-4)


def test_euler_error():
    g = _load()
    got = euler_error(jnp.asarray(g["ang_pred"]), jnp.asarray(g["ang_gt"]))
    np.testing.assert_allclose(got, g["euler"], rtol=1e-4)


def test_joint_angle_error():
    g = _load()
    got = joint_angle_error(jnp.asarray(g["ang_pred"]), jnp.asarray(g["ang_gt"]))
    np.testing.assert_allclose(got, g["joint_angle"], rtol=1e-5)


def test_delta_2_gt():
    g = _load()
    got = delta_2_gt(jnp.asarray(g["delta"]), jnp.asarray(g["last"]))
    np.testing.assert_allclose(got, g["delta_decoded"], atol=1e-5)


def test_l1_angle_loss_matches_formula():
    rs = np.random.RandomState(3)
    pred = rs.randn(5, 10, 48).astype(np.float32)
    gt = rs.randn(5, 10, 48).astype(np.float32)
    got = l1_angle_loss(jnp.asarray(pred), jnp.asarray(gt))
    want = np.mean(np.sum(np.abs(pred - gt), axis=2))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cosine_criteria():
    from motionmixerconv_tpu.metrics import criterion_cos, criterion_cos2

    rs = np.random.RandomState(0)
    a = rs.randn(4, 5, 6).astype(np.float32)
    b = rs.randn(4, 5, 6).astype(np.float32)
    # manual cosine with torch's eps-clamped norms
    def ref(x, y, axis):
        na = np.maximum(np.linalg.norm(x, axis=axis), 1e-6)
        nb = np.maximum(np.linalg.norm(y, axis=axis), 1e-6)
        return (x * y).sum(axis) / (na * nb)

    np.testing.assert_allclose(
        criterion_cos(jnp.asarray(a), jnp.asarray(b)), ref(a, b, 2), atol=1e-6
    )
    np.testing.assert_allclose(
        criterion_cos2(jnp.asarray(a), jnp.asarray(b)), ref(a, b, 1), atol=1e-6
    )


def test_auc_pck_nan_distances_score_zero():
    """NaN joint distances must land in the terminal (zero-credit) bucket —
    searchsorted semantics — not bucket 0 (full credit); a diverged model
    must not report a perfect AUC."""
    import jax.numpy as jnp

    from motionmixerconv_tpu.metrics.metrics import auc_pck_from_dist

    good = jnp.full((4, 5), 0.01, jnp.float32)
    assert float(auc_pck_from_dist(good)) > 0.9
    bad = jnp.full((4, 5), jnp.nan, jnp.float32)
    assert float(auc_pck_from_dist(bad)) == 0.0
    half = good.at[:2].set(jnp.nan)
    mid = float(auc_pck_from_dist(half))
    assert 0.4 < mid < 0.6
