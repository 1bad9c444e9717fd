"""ConvMixer motion-forecasting model (flax.linen).

TPU-native re-design of the reference ConvMixer (h36m/conv_mixer_model.py).
The model-internal layout is NHWC — (B, in_nTP, dimPosEmb, conv_nChan),
time as H, embedding as W, conv channels last — which is the layout TPU
convolutions want; the reference's NCHW transposes disappear.

Replicated reference quirks (required for trained-checkpoint parity):
- one MultiChanSELayer instance serves both conv branches
  (``self.se2 = self.se`` and forward calls ``self.se`` twice,
  conv_mixer_model.py:257,281,289);
- ``mode_conv='once'`` replaces LN2/conv2 with identity but the second
  residual still applies the (shared) SE: x + se(x) (:259-263,287-292);
- the decoder applies exact GELU regardless of the configured activation
  (:462);
- conv2's kernel auto-derives as the clipped transpose of conv1's
  (:242-243).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..ops.activations import get_activation, gelu_exact
from .common import Regularization, conv2d, dense, layer_norm
from .encoding import PoseEncoder

Pad = Union[str, Tuple[int, int], None]


def _pad_arg(padding: Pad):
    """Translate torch padding ('same' or symmetric int tuple) to flax."""
    if padding is None or padding == "same":
        return "SAME"
    ph, pw = padding
    return ((ph, ph), (pw, pw))


class MultiChanSELayer(nn.Module):
    """SE over the time axis of (B, T, E, C) tensors.

    Parity: conv_mixer_model.py:11-70. Squeeze = adaptive avg/max pool over
    (E, C); excitation = Linear(T -> T//r) -> ReLU -> Linear -> sigmoid.
    """

    in_nTP: int
    r: int = 4
    use_max_pooling: bool = False
    dtype: Optional[Any] = None

    def setup(self):
        self.fc1 = dense(self.in_nTP // self.r, fan_in=self.in_nTP,
                         use_bias=False, name="fc1", dtype=self.dtype)
        self.fc2 = dense(self.in_nTP, fan_in=self.in_nTP // self.r,
                         use_bias=False, name="fc2", dtype=self.dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_max_pooling:
            y = jnp.max(x, axis=(2, 3))
        else:
            y = jnp.mean(x, axis=(2, 3))  # (B, T)
        y = nn.relu(self.fc1(y))
        y = nn.sigmoid(self.fc2(y))
        return x * y[:, :, None, None]


class ConvBlock(nn.Module):
    """Conv2d -> activation -> regularization on (B, T, E, C).

    Parity: conv_mixer_model.py:73-142. BatchNorm (regularization == -1) is
    torch BatchNorm2d over the conv-channel axis, which is the trailing axis
    here.
    """

    conv_nChan: int
    kernel_shape: Tuple[int, int] = (1, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Pad = "same"
    activation: str = "gelu"
    regularization: float = 0.0
    dtype: Optional[Any] = None

    def setup(self):
        kh, kw = self.kernel_shape
        self.conv = conv2d(
            self.conv_nChan,
            (kh, kw),
            fan_in=self.conv_nChan * kh * kw,
            padding=_pad_arg(self.padding),
            strides=self.stride,
            name="conv",
            dtype=self.dtype,
        )
        self.reg = Regularization(self.regularization, bn_axis=-1, name="reg",
                                  dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        act = get_activation(self.activation)
        return self.reg(act(self.conv(x)), training)


class ConvMixerBlock(nn.Module):
    """Two conv branches with shared SE and residuals on (B, T, E, C).

    Parity: conv_mixer_model.py:145-292.
    """

    dimPosEmb: int
    in_nTP: int
    conv_nChan: int
    conv1_kernel_shape: Tuple[int, int] = (1, 3)
    conv1_stride: Optional[Tuple[int, int]] = None
    conv1_padding: Pad = None
    mode_conv: str = "twice"
    conv2_kernel_shape: Optional[Tuple[int, int]] = None
    conv2_stride: Optional[Tuple[int, int]] = None
    conv2_padding: Pad = None
    activation: str = "gelu"
    regularization: float = 0.0
    use_se: bool = True
    r_se: int = 4
    use_max_pooling: bool = False
    dtype: Optional[Any] = None

    def setup(self):
        if self.mode_conv not in ("once", "twice"):
            raise ValueError(
                f"mode_conv {self.mode_conv} must be one of 'once' or 'twice'"
            )
        stride1 = self.conv1_stride or (1, 1)
        pad1 = self.conv1_padding if self.conv1_padding is not None else "same"
        self.conv1 = ConvBlock(
            conv_nChan=self.conv_nChan,
            kernel_shape=self.conv1_kernel_shape,
            stride=stride1,
            padding=pad1,
            activation=self.activation,
            regularization=self.regularization,
            dtype=self.dtype,
        )
        if self.use_se:
            # One instance for both branches (reference conv_mixer_model.py:257).
            self.se = MultiChanSELayer(self.in_nTP, self.r_se,
                                       self.use_max_pooling, dtype=self.dtype)
        self.LN1 = layer_norm(name="LN1", axis=-2, dtype=self.dtype)

        if self.mode_conv == "twice":
            k2 = self.conv2_kernel_shape or (
                min(self.conv1_kernel_shape[1], self.in_nTP),
                min(self.conv1_kernel_shape[0], self.dimPosEmb),
            )
            stride2 = self.conv2_stride or (1, 1)
            pad2 = self.conv2_padding if self.conv2_padding is not None else "same"
            self.conv2 = ConvBlock(
                conv_nChan=self.conv_nChan,
                kernel_shape=k2,
                stride=stride2,
                padding=pad2,
                activation=self.activation,
                regularization=self.regularization,
                dtype=self.dtype,
            )
            self.LN2 = layer_norm(name="LN2", axis=-2, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        y = self.LN1(x)
        y = self.conv1(y, training)
        if self.use_se:
            y = self.se(y)
        x = x + y

        if self.mode_conv == "twice":
            y = self.LN2(x)
            y = self.conv2(y, training)
        else:
            y = x  # LN2/conv2 are identity in 'once' mode
        if self.use_se:
            y = self.se(y)
        return x + y


class ConvMixer(nn.Module):
    """(B, in_nTP, dimPosIn) -> (B, out_nTP, dimPosOut).

    Parity: conv_mixer_model.py:295-465. The decoder's Conv2d(in_nTP -> out_nTP,
    k=1) over the time-as-channels axis is an einsum over T; project_channels
    Conv2d(C -> 1, (1,1)) is a Dense over the trailing channel axis.
    """

    num_blocks: int
    dimPosIn: int
    dimPosEmb: int
    dimPosOut: int
    in_nTP: int
    out_nTP: int
    conv_nChan: int = 1
    conv1_kernel_shape: Tuple[int, int] = (1, 3)
    conv1_stride: Optional[Tuple[int, int]] = (1, 1)
    conv1_padding: Pad = None
    mode_conv: str = "twice"
    conv2_kernel_shape: Optional[Tuple[int, int]] = None
    conv2_stride: Optional[Tuple[int, int]] = None
    conv2_padding: Pad = None
    activation: str = "gelu"
    regularization: float = 0.0
    use_se: bool = False
    r_se: int = 4
    use_max_pooling: bool = False
    encoder_n_harmonic_functions: int = 64
    encoder_omega0: float = 0.1
    # fuse the harmonic encoder into one Pallas kernel (training-path HBM
    # traffic eliminator; ops/pallas_harmonic.py). f32 only.
    encoder_fused: bool = False
    # input is the precomputed harmonic embedding (corpus-level cache;
    # Trainer precompute_embed). Params/checkpoints unchanged.
    encoder_precomputed: bool = False
    # "direct" (reference trig numerics) or "doubling" (normalized
    # angle-doubling recurrence, ~one transcendental pair total — the
    # VPU-trig eliminator; see PoseEncoder._doubling_harmonics).
    encoder_harmonic_impl: str = "direct"
    # storage dtype for the materialized harmonic embedding only (e.g.
    # jnp.bfloat16 halves the step's dominant HBM tensor; see
    # PoseEncoder.embed_dtype). Opt-in, not bit-identical.
    encoder_embed_dtype: Optional[Any] = None
    # computation dtype (params stay f32); jnp.bfloat16 = TPU mixed precision
    dtype: Optional[Any] = None

    def setup(self):
        self.encoder = PoseEncoder(
            dimPosIn=self.dimPosIn,
            dimPosEmb=self.dimPosEmb,
            conv_nChan=self.conv_nChan,
            n_harmonic_functions=self.encoder_n_harmonic_functions,
            omega0=self.encoder_omega0,
            dtype=self.dtype,
            fused=self.encoder_fused,
            precomputed=self.encoder_precomputed,
            harmonic_impl=self.encoder_harmonic_impl,
            embed_dtype=self.encoder_embed_dtype,
        )
        self.Mixer_Block = [
            ConvMixerBlock(
                dimPosEmb=self.dimPosEmb,
                in_nTP=self.in_nTP,
                conv_nChan=self.conv_nChan,
                conv1_kernel_shape=self.conv1_kernel_shape,
                conv1_stride=self.conv1_stride,
                conv1_padding=self.conv1_padding,
                mode_conv=self.mode_conv,
                conv2_kernel_shape=self.conv2_kernel_shape,
                conv2_stride=self.conv2_stride,
                conv2_padding=self.conv2_padding,
                activation=self.activation,
                regularization=self.regularization,
                use_se=self.use_se,
                r_se=self.r_se,
                use_max_pooling=self.use_max_pooling,
                dtype=self.dtype,
            )
            for _ in range(self.num_blocks)
        ]
        self.LN = layer_norm(name="LN", axis=-2, dtype=self.dtype)
        # Conv2d(in_nTP, out_nTP, k=1) over time-as-channels == Dense over T.
        self.conv_out = dense(self.out_nTP, fan_in=self.in_nTP, name="conv_out",
                              dtype=self.dtype)
        # Conv2d(conv_nChan, 1, (1,1)) == Dense over the channel axis.
        self.project_channels = dense(1, fan_in=self.conv_nChan,
                                      name="project_channels", dtype=self.dtype)
        self.fc_out = dense(self.dimPosOut, fan_in=self.dimPosEmb,
                            name="fc_out", dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        y = self.encoder(x)  # (B, T, E, C)
        for mb in self.Mixer_Block:
            y = mb(y, training)
        y = self.LN(y)

        # time upsample: (B, T, E, C) -> (B, P, E, C)
        y = jnp.moveaxis(self.conv_out(jnp.moveaxis(y, 1, -1)), -1, 1)
        y = self.project_channels(y)[..., 0]  # (B, P, E)
        y = gelu_exact(y)  # reference hardcodes GELU here (:462)
        return self.fc_out(y)  # (B, P, dimPosOut)
