"""Pose encoding (optional NeRF-style harmonic embedding + linear projection).

Parity: conv_mixer/encoding/positional_encoder.py:4-97. The torch version
shuffles a channel axis around with transposes; here the model-internal layout
is feature-last (B, T, E, C) — TPU/NHWC-friendly — so the channel upscaling is
a Dense over a trailing singleton axis, no transposes.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .common import dense


class PoseEncoder(nn.Module):
    """(B, in_nTP, dimPosIn) -> (B, in_nTP, dimPosEmb, conv_nChan).

    If ``n_harmonic_functions > 0`` each input feature x is expanded to
    [sin(f_i x), cos(f_i x)] with f_i = omega0 * 2**i, laid out
    feature-major exactly like the reference's
    ``(x[..., None] * frequencies).view(..., -1)`` (positional_encoder.py:86-89).
    """

    dimPosIn: int
    dimPosEmb: int
    conv_nChan: int = 1
    n_harmonic_functions: int = 64
    omega0: float = 0.1
    dtype: Optional[Any] = None

    def setup(self):
        if self.n_harmonic_functions <= 0:
            dim_harmonic = self.dimPosIn
        else:
            dim_harmonic = self.n_harmonic_functions * self.dimPosIn * 2
        self.embed_mlp = dense(self.dimPosEmb, fan_in=dim_harmonic,
                               name="embed_mlp", dtype=self.dtype)
        self.channelUpscaling = dense(self.conv_nChan, fan_in=1,
                                      name="channelUpscaling", dtype=self.dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.n_harmonic_functions <= 0:
            embed = x
        else:
            freqs = self.omega0 * (
                2.0 ** jnp.arange(self.n_harmonic_functions, dtype=x.dtype)
            )
            # (B, T, D, n) -> (B, T, D*n), feature-major like torch .view
            e = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
            embed = jnp.concatenate([jnp.sin(e), jnp.cos(e)], axis=-1)

        y = self.embed_mlp(embed)  # (B, T, E)
        y = self.channelUpscaling(y[..., None])  # (B, T, E, C)
        return y
