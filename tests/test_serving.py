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


def test_from_checkpoint_model_none_uses_meta(tmp_path):
    """model=None rebuilds the trained architecture from checkpoint meta —
    here an H36M conv config with non-default dims; a meta-less checkpoint
    raises with a clear message."""
    import pytest

    from motionmixerconv_tpu.cli.train_mixer_h36m import parse_args
    from motionmixerconv_tpu.cli._runner import build_conv_mixer
    from motionmixerconv_tpu.train.state import TrainState, save_checkpoint

    targs = parse_args([
        "--data_dir", "x", "--save_path", "y", "--loss_type", "mpjpe",
        "--output_n", "10", "--num_blocks", "2", "--hidden_dim", "30",
    ])
    model = build_conv_mixer(targs, 66, 66, 10, 10)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 66)),
                           training=False)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats={}, opt_state=(), rng=jax.random.PRNGKey(0),
    )
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, state, epoch=0, meta=vars(targs))
    p = Predictor.from_checkpoint(None, path)
    x = jnp.ones((2, 10, 66))
    out = p.predict(x)
    assert out.shape == (2, 10, 66)
    np.testing.assert_allclose(
        out, model.apply(variables, x, training=False), atol=1e-5)

    bare = str(tmp_path / "bare.ckpt")
    save_checkpoint(bare, state, epoch=0)  # no meta
    with pytest.raises(ValueError, match="meta"):
        Predictor.from_checkpoint(None, bare)


def test_model_from_meta_families():
    """The meta->model rebuild distinguishes the trainer families without a
    model_type flag: AMASS (mlp) vs AIS (conv kernel flags), and the
    autoregressive *_model window args."""
    from motionmixerconv_tpu.cli._runner import model_from_checkpoint_meta
    from motionmixerconv_tpu.models import ConvMixer, MlpMixer

    amass_meta = {"input_n": 10, "output_n": 25, "pose_dim": 54,
                  "num_blocks": 2, "hidden_dim": 32, "tokens_mlp_dim": 8,
                  "channels_mlp_dim": 32, "activation": "gelu",
                  "regularization": 0.1, "r_se": 8}
    m, shape = model_from_checkpoint_meta(amass_meta)
    assert isinstance(m, MlpMixer) and shape == (1, 10, 54)

    ais_meta = dict(amass_meta, pose_dim=57, conv1_kernel_shape=(5, 9),
                    conv_nChan=2)
    m, shape = model_from_checkpoint_meta(ais_meta)
    assert isinstance(m, ConvMixer) and m.conv1_kernel_shape == (5, 9)
    assert shape == (1, 10, 57)

    ar_meta = dict(ais_meta, input_n_model=10, output_n_model=5,
                   input_n=10, output_n=25)
    m, shape = model_from_checkpoint_meta(ar_meta)
    assert m.out_nTP == 5 and shape == (1, 10, 57)
