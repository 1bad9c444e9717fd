"""Parity tests for the fused Pallas MlpMixer kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionmixerconv_tpu.models import MlpMixer
from motionmixerconv_tpu.ops.pallas_mixer import FusedMlpMixer


def _warm_bn(model, variables, x, steps=3):
    """Run a few training-mode applies so BatchNorm stats are non-trivial."""
    vs = dict(variables)
    for i in range(steps):
        _, upd = model.apply(vs, x + 0.1 * i, training=True,
                             mutable=["batch_stats"])
        vs["batch_stats"] = upd["batch_stats"]
    return vs


def _case(activation, use_se, num_blocks=2, hidden=50, tok=20, ch=50,
          seq=10, pred=25, dim=66, r_se=4, regularization=0.1,
          use_max_pooling=False, mlp_block_type="normal"):
    model = MlpMixer(
        num_classes=dim, num_blocks=num_blocks, hidden_dim=hidden,
        tokens_mlp_dim=tok, channels_mlp_dim=ch, seq_len=seq, pred_len=pred,
        activation=activation, regularization=regularization, input_size=dim,
        r_se=r_se, use_se=use_se, use_max_pooling=use_max_pooling,
        mlp_block_type=mlp_block_type,
    )
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(37, seq, dim).astype(np.float32) * 0.5)
    variables = model.init(jax.random.PRNGKey(3), x, training=False)
    if regularization == -1.0:
        variables = _warm_bn(model, variables, x)
    want = model.apply(variables, x, training=False)
    fused = FusedMlpMixer(model, variables)
    return fused, x, want


@pytest.mark.parametrize("activation", ["gelu", "mish"])
@pytest.mark.parametrize("use_se", [True, False])
def test_fused_matches_flax(activation, use_se):
    fused, x, want = _case(activation, use_se)
    got = fused(x, block_b=16, interpret=True)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fused_amass_config():
    # AMASS flagship: hidden 128, 5 blocks, 54-dim pose, use_se=True
    fused, x, want = _case("gelu", True, num_blocks=3, hidden=128, tok=20,
                           ch=128, dim=54, r_se=8)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_ragged_batch_and_block_sizes():
    fused, x, want = _case("gelu", True)
    for bb in (8, 32, 256):
        got = fused(x, block_b=bb, interpret=True)
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_fused_batchnorm_parity():
    """BatchNorm configs run in-kernel via the folded (A, P) affines —
    warmed running stats, both block types' BN axes (H and S)."""
    fused, x, want = _case("gelu", True, regularization=-1.0)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fused_max_pool_se():
    """use_max_pooling squeezes with max, not mean (mlp_mixer.py:20-22);
    the fused kernel must match (this silently diverged before round 2)."""
    fused, x, want = _case("gelu", True, use_max_pooling=True)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=2e-4)
    # and combined with BatchNorm
    fused, x, want = _case("mish", True, use_max_pooling=True,
                           regularization=-1.0)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.parametrize("block_type", ["channel_only", "token_only"])
@pytest.mark.parametrize("use_se", [True, False])
def test_fused_variant_block_types(block_type, use_se):
    """channel_only / token_only variants (mlp_mixer.py:166-236), incl.
    their residual quirks (x + se(x) lead-in; x + 2y double residual)."""
    fused, x, want = _case("gelu", use_se, mlp_block_type=block_type)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fused_variant_block_types_bn():
    fused, x, want = _case("mish", True, mlp_block_type="channel_only",
                           regularization=-1.0)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=2e-4)
    fused, x, want = _case("gelu", True, mlp_block_type="token_only",
                           regularization=-1.0, use_max_pooling=True)
    got = fused(x, block_b=8, interpret=True)
    np.testing.assert_allclose(got, want, atol=2e-4)
