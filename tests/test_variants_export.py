"""Mixer-variant block parity + torch state_dict export roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionmixerconv_tpu.models.mixer_mlp import MixerBlockChannel, MixerBlockToken
from motionmixerconv_tpu.models import MlpMixer, convert_mlp_mixer
from motionmixerconv_tpu.models.torch_io import export_mlp_mixer

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _block_variables(sd, has_ln1):
    mb = "mlp_block_token_mixing" if has_ln1 else "mlp_block_channel_mixing"
    ln = "LN1" if has_ln1 else "LN2"
    params = {
        mb: {
            "fc1": {"kernel": sd[f"{mb}.fc1.weight"].T, "bias": sd[f"{mb}.fc1.bias"]},
            "fc2": {"kernel": sd[f"{mb}.fc2.weight"].T, "bias": sd[f"{mb}.fc2.bias"]},
        },
        "se": {
            "fc1": {"kernel": sd["se.excitation.0.weight"].T},
            "fc2": {"kernel": sd["se.excitation.2.weight"].T},
        },
        ln: {"scale": sd[f"{ln}.weight"], "bias": sd[f"{ln}.bias"]},
    }
    return {"params": params}


def test_token_only_variant_double_residual_quirk():
    g = np.load(os.path.join(GOLDEN, "mixer_variants.npz"))
    sd = {k[5:]: g[k] for k in g.files if k.startswith("tok::")}
    block = MixerBlockToken(
        tokens_mlp_dim=20, seq_len=10, hidden_dim=50, activation="gelu",
        regularization=0.0, r_se=4, use_se=True,
    )
    variables = _block_variables(sd, has_ln1=True)
    got = block.apply(variables, jnp.asarray(g["x"]), training=False)
    np.testing.assert_allclose(got, g["out_tok"], atol=2e-5)


def test_channel_only_variant():
    g = np.load(os.path.join(GOLDEN, "mixer_variants.npz"))
    sd = {k[4:]: g[k] for k in g.files if k.startswith("ch::")}
    block = MixerBlockChannel(
        channels_mlp_dim=30, seq_len=10, hidden_dim=50, activation="gelu",
        regularization=0.0, r_se=4, use_se=True,
    )
    variables = _block_variables(sd, has_ln1=False)
    got = block.apply(variables, jnp.asarray(g["x"]), training=False)
    np.testing.assert_allclose(got, g["out_ch"], atol=2e-5)


def test_torch_export_roundtrip():
    """flax -> torch state_dict -> flax reproduces the forward exactly."""
    model = MlpMixer(
        num_classes=66, num_blocks=2, hidden_dim=50, tokens_mlp_dim=20,
        channels_mlp_dim=50, seq_len=10, pred_len=25, activation="mish",
        regularization=0.1, input_size=66, r_se=8, use_se=True,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(3, 10, 66).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(5), x, training=False)
    want = model.apply(variables, x, training=False)

    sd = export_mlp_mixer(variables, num_blocks=2)
    back = convert_mlp_mixer(sd, num_blocks=2)
    got = model.apply(back, x, training=False)
    np.testing.assert_allclose(got, want, atol=1e-6)

    # exported shapes match the torch layout conventions
    assert sd["conv.weight"].shape == (50, 1, 1, 66)
    assert sd["conv_out.weight"].shape == (25, 10, 1)
    assert sd["Mixer_Block.0.mlp_block_token_mixing.fc1.weight"].shape == (20, 10)


def test_conv_mixer_export_roundtrip_and_torch_load():
    """flax ConvMixer -> torch state_dict -> (a) flax roundtrip matches,
    (b) the REFERENCE torch ConvMixer accepts the state_dict when present."""
    from motionmixerconv_tpu.models import ConvMixer, convert_conv_mixer
    from motionmixerconv_tpu.models.torch_io import export_conv_mixer

    model = ConvMixer(
        num_blocks=2, dimPosIn=66, dimPosEmb=50, dimPosOut=66, in_nTP=10,
        out_nTP=25, conv_nChan=1, conv1_kernel_shape=(1, 3),
        conv1_padding=(0, 1), mode_conv="twice", activation="mish",
        regularization=0.1, use_se=True, r_se=8,
        encoder_n_harmonic_functions=64, encoder_omega0=0.1,
    )
    x = jnp.asarray(np.random.RandomState(1).randn(3, 10, 66).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(7), x, training=False)
    want = model.apply(variables, x, training=False)

    sd = export_conv_mixer(variables, num_blocks=2, n_harmonic_functions=64, omega0=0.1)
    back = convert_conv_mixer(sd, num_blocks=2)
    got = model.apply(back, x, training=False)
    np.testing.assert_allclose(got, want, atol=1e-6)

    # key-set compatibility with the reference state_dict layout
    golden = np.load(os.path.join(GOLDEN, "model_conv_mixer.npz"))
    ref_keys = {k[4:] for k in golden.files if k.startswith("sd::")}
    assert set(sd.keys()) == ref_keys, (
        f"missing={ref_keys - set(sd)} extra={set(sd) - ref_keys}"
    )


def test_mlp_mixer_bn_export_roundtrip_and_keyset():
    """BatchNorm-regularized MlpMixer: reference sd -> flax -> export
    reproduces the reference state_dict (keys AND values; the only exception
    is num_batches_tracked, whose value torch never reads with a fixed
    momentum — the key itself is required by strict load_state_dict)."""
    golden = np.load(os.path.join(GOLDEN, "model_mlp_mixer_bn.npz"))
    ref_sd = {k[4:]: golden[k] for k in golden.files if k.startswith("sd::")}
    variables = convert_mlp_mixer(ref_sd, num_blocks=2)
    sd = export_mlp_mixer(variables, num_blocks=2)
    assert set(sd.keys()) == set(ref_sd.keys()), (
        f"missing={set(ref_sd) - set(sd)} extra={set(sd) - set(ref_sd)}"
    )
    for k, v in ref_sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(sd[k], v, err_msg=k)


def test_conv_mixer_bn_export_roundtrip_and_keyset():
    """BatchNorm multi-channel ConvMixer (the autoreg CLI default shape of
    regularization): reference sd -> flax -> export is lossless."""
    from motionmixerconv_tpu.models import convert_conv_mixer
    from motionmixerconv_tpu.models.torch_io import export_conv_mixer

    golden = np.load(os.path.join(GOLDEN, "model_conv_mixer_multichan.npz"))
    ref_sd = {k[4:]: golden[k] for k in golden.files if k.startswith("sd::")}
    variables = convert_conv_mixer(ref_sd, num_blocks=2)
    sd = export_conv_mixer(variables, num_blocks=2, n_harmonic_functions=8,
                           omega0=0.1)
    assert set(sd.keys()) == set(ref_sd.keys()), (
        f"missing={set(ref_sd) - set(sd)} extra={set(sd) - set(ref_sd)}"
    )
    for k, v in ref_sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(sd[k], v, err_msg=k)


def test_reference_torch_loads_export_and_forward_matches():
    """When /root/reference + torch are available: the reference's OWN torch
    modules load our exported state_dict with strict=True and produce the
    same forward — models trained here are drop-in checkpoints for the
    reference, including the BatchNorm-regularized autoreg default shape."""
    import sys

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not mounted")
    torch = pytest.importorskip("torch")
    for p in ("/root/reference", "/root/reference/h36m",
              "/root/reference/conv_mixer"):
        if p not in sys.path:
            sys.path.insert(0, p)
    torch.Tensor.cuda = lambda self, *a, **k: self
    from h36m.conv_mixer_model import ConvMixer as RefConvMixer

    from motionmixerconv_tpu.models import ConvMixer
    from motionmixerconv_tpu.models.torch_io import export_conv_mixer

    kw = dict(num_blocks=2, dimPosIn=66, dimPosEmb=64, dimPosOut=66,
              in_nTP=10, out_nTP=5, conv_nChan=8, conv1_kernel_shape=(5, 5),
              conv1_stride=(1, 1), conv1_padding=None, mode_conv="twice",
              activation="mish", regularization=-1.0, use_se=True, r_se=8,
              use_max_pooling=False, encoder_n_harmonic_functions=0,
              encoder_omega0=0.1)
    model = ConvMixer(**kw)
    x = np.random.RandomState(2).randn(4, 10, 66).astype(np.float32) * 0.5
    variables = model.init(jax.random.PRNGKey(3), jnp.asarray(x), training=False)
    # populate BN stats with one training-mode pass so running stats are
    # non-trivial on both sides
    _, upd = model.apply(variables, jnp.asarray(x), training=True,
                         rngs={"dropout": jax.random.PRNGKey(4)},
                         mutable=["batch_stats"])
    variables = {"params": variables["params"], **upd}
    want = np.asarray(model.apply(variables, jnp.asarray(x), training=False))

    sd = export_conv_mixer(variables, num_blocks=2)
    ref = RefConvMixer(**kw)
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    ref.eval()
    with torch.no_grad():
        got = ref(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)
