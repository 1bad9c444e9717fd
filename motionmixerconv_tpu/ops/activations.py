"""Activation functions with exact torch-parity numerics.

torch ``nn.GELU()`` uses the exact erf formulation; JAX's default
``jax.nn.gelu`` is the tanh approximation, so parity requires
``approximate=False`` (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU, matching torch ``nn.GELU()``."""
    return jax.nn.gelu(x, approximate=False)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """Mish: x * tanh(softplus(x)).

    Matches both the hand-rolled reference (h36m/mlp_mixer.py:37-41) and
    torch ``nn.Mish`` (h36m/conv_mixer_model.py:124).
    """
    return x * jnp.tanh(jax.nn.softplus(x))


_ACTIVATIONS: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "gelu": gelu_exact,
    "mish": mish,
}


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Resolve an activation by name ('gelu' | 'mish').

    Raises ValueError for unknown names, mirroring the reference
    (h36m/mlp_mixer.py:83, h36m/conv_mixer_model.py:126).
    """
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"Unknown activation function type: {name}") from None
