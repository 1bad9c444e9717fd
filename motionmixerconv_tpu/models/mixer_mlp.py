"""MLP-Mixer motion-forecasting model (flax.linen).

TPU-native re-design of the reference MlpMixer (h36m/mlp_mixer.py,
duplicated at amass/mlp_mixer.py). Architectural parity notes:

- The pose embedding Conv2d(1, hidden, (1, input_size)) collapses the whole
  feature axis per frame, i.e. it *is* a per-frame Linear — implemented as a
  Dense here (one (B*T, D) x (D, H) MXU matmul instead of an im2col conv).
- The time-upsampling Conv1d(seq_len, pred_len, 1) treats time as channels,
  i.e. a Dense over the time axis.
- One SELayer instance is shared between the token-mix and channel-mix
  branches of MixerBlock (reference quirk, h36m/mlp_mixer.py:133,153-162) —
  replicated here via a single submodule called twice.
- MixerBlock_Token returns x + 2*se(token_mix(x)) (reference quirk,
  h36m/mlp_mixer.py:234-236) — replicated.

Submodule / parameter names mirror the torch attribute names so reference
checkpoints map mechanically (see models/torch_io.py).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.activations import get_activation
from .common import Regularization, dense, layer_norm


class SELayer(nn.Module):
    """Squeeze-and-Excitation over the time axis of (B, S, H) sequences.

    Parity: h36m/mlp_mixer.py:6-34. Squeeze = adaptive avg/max pool over the
    last axis; excitation = Linear(c -> c//r) -> ReLU -> Linear(c//r -> c)
    -> sigmoid, both without bias.
    """

    c: int
    r: int = 4
    use_max_pooling: bool = False
    dtype: Optional[Any] = None

    def setup(self):
        self.fc1 = dense(self.c // self.r, fan_in=self.c, use_bias=False,
                         name="fc1", dtype=self.dtype)
        self.fc2 = dense(self.c, fan_in=self.c // self.r, use_bias=False,
                         name="fc2", dtype=self.dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.max(x, axis=-1) if self.use_max_pooling else jnp.mean(x, axis=-1)
        y = nn.relu(self.fc1(y))
        y = nn.sigmoid(self.fc2(y))
        return x * y[..., None]


class MlpBlock(nn.Module):
    """Two-layer MLP with activation + regularization after each layer.

    Parity: h36m/mlp_mixer.py:44-96. ``bn_dim`` is the torch BatchNorm1d
    channel count, which is axis 1 of the 3-D input in both uses.
    """

    hidden_dim: int
    input_dim: int
    bn_dim: int
    activation: str = "gelu"
    regularization: float = 0.0
    dtype: Optional[Any] = None

    def setup(self):
        self.fc1 = dense(self.hidden_dim, fan_in=self.input_dim, name="fc1",
                         dtype=self.dtype)
        self.fc2 = dense(self.input_dim, fan_in=self.hidden_dim, name="fc2",
                         dtype=self.dtype)
        self.reg1 = Regularization(self.regularization, bn_axis=1, name="reg1",
                                   dtype=self.dtype)
        self.reg2 = Regularization(self.regularization, bn_axis=1, name="reg2",
                                   dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        act = get_activation(self.activation)
        x = self.reg1(act(self.fc1(x)), training)
        x = self.reg2(self.fc2(x), training)
        return x


class MixerBlock(nn.Module):
    """Token-mix + channel-mix block with shared SE and residuals.

    Parity: h36m/mlp_mixer.py:100-164.
    Input/output: (B, seq_len, hidden_dim).
    """

    tokens_mlp_dim: int
    channels_mlp_dim: int
    seq_len: int
    hidden_dim: int
    activation: str = "gelu"
    regularization: float = 0.0
    r_se: int = 4
    use_max_pooling: bool = False
    use_se: bool = True
    dtype: Optional[Any] = None

    def setup(self):
        self.mlp_block_token_mixing = MlpBlock(
            self.tokens_mlp_dim, self.seq_len, self.hidden_dim,
            self.activation, self.regularization, dtype=self.dtype,
        )
        self.mlp_block_channel_mixing = MlpBlock(
            self.channels_mlp_dim, self.hidden_dim, self.seq_len,
            self.activation, self.regularization, dtype=self.dtype,
        )
        if self.use_se:
            # NOTE: a single instance serves both branches (reference quirk).
            self.se = SELayer(self.seq_len, self.r_se, self.use_max_pooling,
                              dtype=self.dtype)
        self.LN1 = layer_norm(name="LN1", dtype=self.dtype)
        self.LN2 = layer_norm(name="LN2", dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        y = self.LN1(x)
        y = jnp.swapaxes(y, 1, 2)  # (B, H, S)
        y = self.mlp_block_token_mixing(y, training)
        y = jnp.swapaxes(y, 1, 2)  # (B, S, H)
        if self.use_se:
            y = self.se(y)
        x = x + y

        y = self.LN2(x)
        y = self.mlp_block_channel_mixing(y, training)
        if self.use_se:
            y = self.se(y)
        return x + y


class MixerBlockChannel(nn.Module):
    """Channel-mixing-only variant (h36m/mlp_mixer.py:166-199).

    Replicates the reference forward exactly, including the leading
    x = x + se(x) residual.
    """

    channels_mlp_dim: int
    seq_len: int
    hidden_dim: int
    activation: str = "gelu"
    regularization: float = 0.0
    r_se: int = 4
    use_max_pooling: bool = False
    use_se: bool = True
    dtype: Optional[Any] = None

    def setup(self):
        self.mlp_block_channel_mixing = MlpBlock(
            self.channels_mlp_dim, self.hidden_dim, self.seq_len,
            self.activation, self.regularization, dtype=self.dtype,
        )
        if self.use_se:
            self.se = SELayer(self.seq_len, self.r_se, self.use_max_pooling,
                              dtype=self.dtype)
        self.LN2 = layer_norm(name="LN2", dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        y = self.se(x) if self.use_se else x
        x = x + y
        y = self.LN2(x)
        y = self.mlp_block_channel_mixing(y, training)
        if self.use_se:
            y = self.se(y)
        return x + y


class MixerBlockToken(nn.Module):
    """Token-mixing-only variant (h36m/mlp_mixer.py:203-236).

    Replicates the reference's double-residual quirk: returns
    (x + y) + y = x + 2*se(token_mix(LN(x))).
    """

    tokens_mlp_dim: int
    seq_len: int
    hidden_dim: int
    activation: str = "gelu"
    regularization: float = 0.0
    r_se: int = 4
    use_max_pooling: bool = False
    use_se: bool = True
    dtype: Optional[Any] = None

    def setup(self):
        self.mlp_block_token_mixing = MlpBlock(
            self.tokens_mlp_dim, self.seq_len, self.hidden_dim,
            self.activation, self.regularization, dtype=self.dtype,
        )
        if self.use_se:
            self.se = SELayer(self.seq_len, self.r_se, self.use_max_pooling,
                              dtype=self.dtype)
        self.LN1 = layer_norm(name="LN1", dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        y = self.LN1(x)
        y = jnp.swapaxes(y, 1, 2)
        y = self.mlp_block_token_mixing(y, training)
        y = jnp.swapaxes(y, 1, 2)
        if self.use_se:
            y = self.se(y)
        x = x + y
        return x + y


class MlpMixer(nn.Module):
    """Pose-sequence MLP-Mixer: (B, seq_len, input_size) -> (B, pred_len, num_classes).

    Parity: h36m/mlp_mixer.py:239-337. ``mlp_block_type`` selects the block
    variant ('normal' | 'channel_only' | 'token_only'); the reference hardcodes
    'normal' via its channel_only/token_only flags (:271-272).
    """

    num_classes: int
    num_blocks: int
    hidden_dim: int
    tokens_mlp_dim: int
    channels_mlp_dim: int
    seq_len: int
    pred_len: int
    activation: str = "gelu"
    mlp_block_type: str = "normal"
    regularization: float = 0.0
    input_size: int = 51
    r_se: int = 4
    use_max_pooling: bool = False
    use_se: bool = False
    # computation dtype (params stay f32); jnp.bfloat16 = TPU mixed precision
    dtype: Optional[Any] = None

    def setup(self):
        # torch: Conv2d(1, hidden, (1, input_size)) == per-frame Linear.
        self.conv = dense(self.hidden_dim, fan_in=self.input_size, name="conv",
                          dtype=self.dtype)
        block_kwargs = dict(
            seq_len=self.seq_len,
            hidden_dim=self.hidden_dim,
            activation=self.activation,
            regularization=self.regularization,
            r_se=self.r_se,
            use_max_pooling=self.use_max_pooling,
            use_se=self.use_se,
            dtype=self.dtype,
        )
        if self.mlp_block_type == "channel_only":
            blocks = [
                MixerBlockChannel(channels_mlp_dim=self.channels_mlp_dim, **block_kwargs)
                for _ in range(self.num_blocks)
            ]
        elif self.mlp_block_type == "token_only":
            blocks = [
                MixerBlockToken(tokens_mlp_dim=self.tokens_mlp_dim, **block_kwargs)
                for _ in range(self.num_blocks)
            ]
        else:
            blocks = [
                MixerBlock(
                    tokens_mlp_dim=self.tokens_mlp_dim,
                    channels_mlp_dim=self.channels_mlp_dim,
                    **block_kwargs,
                )
                for _ in range(self.num_blocks)
            ]
        self.Mixer_Block = blocks
        self.LN = layer_norm(name="LN", dtype=self.dtype)
        self.fc_out = dense(self.num_classes, fan_in=self.hidden_dim,
                            name="fc_out", dtype=self.dtype)
        # torch: Conv1d(seq_len, pred_len, 1) == Dense over the time axis.
        self.conv_out = dense(self.pred_len, fan_in=self.seq_len,
                              name="conv_out", dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        # (B, T, D) -> (B, T, H): pose embedding.
        y = self.conv(x)
        for mb in self.Mixer_Block:
            y = mb(y, training)
        y = self.LN(y)
        # time upsample: (B, T, H) -> (B, P, H)
        y = jnp.swapaxes(self.conv_out(jnp.swapaxes(y, 1, 2)), 1, 2)
        return self.fc_out(y)
