"""Parity tests for the fused ConvMixer kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionmixerconv_tpu.models import ConvMixer
from motionmixerconv_tpu.ops.pallas_conv_mixer import (
    FusedConvMixer,
    FusedConvMixerMC,
    make_fused_conv_mixer,
)


def _case(mode_conv="twice", k1=(1, 3), activation="mish", use_se=True,
          nharm=8, num_blocks=2, emb=50, in_ntp=10, out_ntp=25, dim=66,
          conv_nChan=1, r_se=2, batch=19, regularization=0.1,
          use_max_pooling=False):
    model = ConvMixer(
        num_blocks=num_blocks, dimPosIn=dim, dimPosEmb=emb, dimPosOut=dim,
        in_nTP=in_ntp, out_nTP=out_ntp, conv_nChan=conv_nChan,
        conv1_kernel_shape=k1, conv1_stride=(1, 1), conv1_padding=None,
        mode_conv=mode_conv, activation=activation,
        regularization=regularization,
        use_se=use_se, r_se=r_se, use_max_pooling=use_max_pooling,
        encoder_n_harmonic_functions=nharm, encoder_omega0=0.1,
    )
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(batch, in_ntp, dim).astype(np.float32) * 0.5)
    variables = model.init(jax.random.PRNGKey(4), x, training=False)
    if regularization == -1.0:
        # warm the BatchNorm running stats so they are non-trivial
        for i in range(3):
            _, upd = model.apply(variables, x + 0.1 * i, training=True,
                                 mutable=["batch_stats"])
            variables = {**variables, "batch_stats": upd["batch_stats"]}
    want = model.apply(variables, x, training=False)
    return make_fused_conv_mixer(model, variables), x, want


@pytest.mark.parametrize("k1", [(1, 3), (5, 5), (2, 4)])
def test_fused_conv_mixer_kernels(k1):
    fused, x, want = _case(k1=k1)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_fused_conv_mixer_once_mode():
    fused, x, want = _case(mode_conv="once", activation="gelu")
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_fused_conv_mixer_no_se_no_harmonics():
    fused, x, want = _case(use_se=False, nharm=-1)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_multichannel_rejected_by_single_channel_kernel():
    model = ConvMixer(
        num_blocks=1, dimPosIn=66, dimPosEmb=32, dimPosOut=66, in_nTP=10,
        out_nTP=5, conv_nChan=2, encoder_n_harmonic_functions=-1,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 66)))
    with pytest.raises(NotImplementedError):
        FusedConvMixer(model, variables)
    # ... but the factory routes it to the multi-channel kernel
    assert isinstance(make_fused_conv_mixer(model, variables), FusedConvMixerMC)


def test_fused_mc_study_shape():
    """The ConvMixer study's fixed shape (sweep/conv_study.py:61-65):
    conv_nChan=8, dimPosEmb=192 (two lane tiles), k=(5, 9), 6 blocks —
    previously silently fell back to XLA in serving."""
    fused, x, want = _case(
        conv_nChan=8, emb=192, k1=(5, 9), num_blocks=6, activation="gelu",
        r_se=2, batch=9,
    )
    assert isinstance(fused, FusedConvMixerMC)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("k1", [(1, 3), (9, 29), (2, 4)])
def test_fused_mc_kernels(k1):
    """Multi-channel kernel across kernel shapes, incl. the study's largest
    (9, 29) and an even-kernel 'same' padding case."""
    fused, x, want = _case(conv_nChan=4, emb=40, k1=k1, batch=11)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_fused_mc_once_mode_no_se():
    fused, x, want = _case(conv_nChan=3, mode_conv="once", activation="gelu",
                           use_se=False, nharm=-1, emb=33, batch=5)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.parametrize("conv_nChan", [1, 8])
def test_fused_batchnorm_parity(conv_nChan):
    """BatchNorm (regularization == -1) runs in-kernel as per-conv-channel
    affine rows with warmed running stats, in both kernels."""
    fused, x, want = _case(conv_nChan=conv_nChan, regularization=-1.0,
                           activation="gelu", emb=40, batch=9)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.parametrize("conv_nChan", [1, 8])
def test_fused_max_pool_se(conv_nChan):
    """Max-pool SE squeeze (conv_mixer_model.py:30-36) — the C=1 kernel
    silently used mean before round 2; the MC kernel rejected it."""
    fused, x, want = _case(conv_nChan=conv_nChan, use_max_pooling=True,
                           emb=40, batch=9)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_fused_mc_batchnorm_max_pool_combined():
    fused, x, want = _case(conv_nChan=4, regularization=-1.0,
                           use_max_pooling=True, mode_conv="once",
                           activation="gelu", emb=33, batch=5)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=5e-4)
