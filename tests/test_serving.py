"""Serving API tests (CPU: fused kernel disabled, plain path + rollout)."""

import jax
import jax.numpy as jnp
import numpy as np

from motionmixerconv_tpu.models import MlpMixer
from motionmixerconv_tpu.serving import Predictor


def _model_and_vars(pred_len=5):
    model = MlpMixer(
        num_classes=66, num_blocks=1, hidden_dim=24, tokens_mlp_dim=8,
        channels_mlp_dim=24, seq_len=10, pred_len=pred_len, activation="gelu",
        regularization=0.0, input_size=66, use_se=True,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 66)))
    return model, variables


def test_predict_shapes():
    model, variables = _model_and_vars()
    p = Predictor(model, variables)
    x = jnp.asarray(np.random.RandomState(0).randn(7, 10, 66).astype(np.float32))
    out = p.predict(x)
    assert out.shape == (7, 5, 66)


def test_autoregressive_rollout_horizon():
    model, variables = _model_and_vars(pred_len=5)
    p = Predictor(model, variables)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 10, 66).astype(np.float32))
    out = p.predict_autoregressive(x, horizon=23)
    assert out.shape == (3, 23, 66)
    # first window of the rollout equals a direct prediction
    direct = p.predict(x)
    np.testing.assert_allclose(out[:, :5], direct, atol=1e-5)


def test_mesh_sharded_bulk_predict():
    """Bulk predictions shard over the mesh's data axis and match the
    single-device path, including ragged (non-device-multiple) batches."""
    from motionmixerconv_tpu.parallel import make_mesh

    model, variables = _model_and_vars()
    single = Predictor(model, variables)
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest's virtual CPU devices
    sharded = Predictor(model, variables, mesh=mesh, fused_max_batch=0)
    for batch in (19, 64):
        x = jnp.asarray(
            np.random.RandomState(batch).randn(batch, 10, 66).astype(np.float32))
        got = sharded.predict(x)
        assert got.shape == (batch, 5, 66)
        np.testing.assert_allclose(got, single.predict(x), atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    from motionmixerconv_tpu.train.state import TrainState, save_checkpoint

    model, variables = _model_and_vars()
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats={}, opt_state=(), rng=jax.random.PRNGKey(0),
    )
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, state, epoch=3)
    p = Predictor.from_checkpoint(model, path)
    x = jnp.ones((2, 10, 66))
    np.testing.assert_allclose(
        p.predict(x), model.apply(variables, x, training=False), atol=1e-6
    )
