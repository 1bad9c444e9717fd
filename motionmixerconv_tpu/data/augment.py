"""Masking augmentations.

Parity with the reference's (defined-but-unused) augmentations
(h36m/utils/utils_mixer.py:180-202): random frame zeroing and random
joint-triplet zeroing — expressed functionally with explicit JAX PRNG keys
instead of Python's global ``random``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_sequence(key: jax.Array, seq: jnp.ndarray, mframes: int) -> jnp.ndarray:
    """Zero ``mframes`` randomly chosen time steps (with replacement).

    Parity: utils_mixer.py:180-187.
    Args:
        seq: (B, T, D).
    """
    idx = jax.random.randint(key, (mframes,), 0, seq.shape[1])
    return seq.at[:, idx, :].set(0.0)


def mask_joints(key: jax.Array, seq: jnp.ndarray, mjoints: int) -> jnp.ndarray:
    """Zero ``mjoints`` randomly chosen xyz joint triplets (with replacement).

    Parity: utils_mixer.py:191-202 (which samples triplet starts from
    range(0, 66, 3)).
    Args:
        seq: (B, T, D) with D a multiple of 3.
    """
    n_joints = seq.shape[2] // 3
    j = jax.random.randint(key, (mjoints,), 0, n_joints)
    cols = (j[:, None] * 3 + jnp.arange(3)[None, :]).reshape(-1)
    return seq.at[:, :, cols].set(0.0)
