"""Shared building blocks for the mixer models.

Initialisation matches torch defaults (kaiming-uniform with a=sqrt(5), i.e.
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weights and biases) so that
training dynamics match the reference when training from scratch.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear / nn.Conv default weight init for flax kernel shapes.

    flax Dense kernels are (in, out); Conv kernels are (*window, in, out).
    fan_in = prod(shape[:-1]).
    """
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dense(features: int, fan_in: int, use_bias: bool = True,
          name: str | None = None, dtype=None):
    """nn.Dense with torch-default initialisation.

    ``dtype`` is the flax computation dtype (params stay float32); pass
    jnp.bfloat16 for mixed-precision compute on the MXU.
    """
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(fan_in),
        name=name,
        dtype=dtype,
    )


def conv2d(
    features: int,
    kernel_size: Sequence[int],
    fan_in: int,
    padding,
    strides: Sequence[int] = (1, 1),
    name: str | None = None,
    dtype=None,
):
    """nn.Conv (NHWC) with torch-default initialisation.

    ``padding`` is either the string 'SAME' or an explicit ((ph, ph), (pw, pw))
    pair matching torch's symmetric int-tuple padding.
    """
    return nn.Conv(
        features,
        kernel_size=tuple(kernel_size),
        strides=tuple(strides),
        padding=padding,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(fan_in),
        name=name,
        dtype=dtype,
    )


class Regularization(nn.Module):
    """Dropout / BatchNorm / identity switch used throughout the reference.

    regularization > 0  -> Dropout(p)        (torch nn.Dropout)
    regularization == -1 -> BatchNorm        (torch nn.BatchNorm1d/2d, feature
                                              axis given by ``bn_axis``)
    otherwise            -> identity

    Mirrors h36m/mlp_mixer.py:68-76 and h36m/conv_mixer_model.py:113-119.
    torch BN defaults: momentum 0.1 (flax momentum = 0.9), eps 1e-5.
    """

    regularization: float = 0.0
    bn_axis: int = -1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        if self.regularization > 0.0:
            return nn.Dropout(rate=self.regularization, deterministic=not training)(x)
        if self.regularization == -1.0:
            return nn.BatchNorm(
                use_running_average=not training,
                axis=self.bn_axis,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        return x


def layer_norm(name: str | None = None, axis: int = -1, dtype=None):
    """LayerNorm matching torch nn.LayerNorm(eps=1e-5) over one axis."""
    return nn.LayerNorm(
        epsilon=1e-5, reduction_axes=axis, feature_axes=axis, name=name,
        dtype=dtype,
    )
