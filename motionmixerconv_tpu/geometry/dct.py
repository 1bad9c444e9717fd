"""DCT/IDCT trajectory-space helpers.

Parity with the reference's (defined-but-unused) DCT utilities
(h36m/utils/utils_mixer.py:76-114, h36m/utils/data_utils.py:588-597):
orthonormal DCT-II matrix pairs and sequence transforms. Kept in the
capability surface because downstream motion-prediction work (HisRepItself
lineage) encodes trajectories in DCT space.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def get_dct_matrix(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(dct_m, idct_m): orthonormal DCT-II matrix and its inverse.

    Same construction as the reference's double loop (utils_mixer.py:76-85),
    vectorised.
    """
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    w = np.full((n, 1), np.sqrt(2.0 / n))
    w[0] = np.sqrt(1.0 / n)
    dct_m = w * np.cos(np.pi * (i + 0.5) * k / n)
    idct_m = np.linalg.inv(dct_m)
    return dct_m.astype(np.float64), idct_m.astype(np.float64)


def dct_transform(seq: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) -> DCT coefficients over the time axis (utils_mixer.py:89-100)."""
    t = seq.shape[1]
    dct_m, _ = get_dct_matrix(t)
    return jnp.einsum("kt,btd->bkd", jnp.asarray(dct_m, seq.dtype), seq)


def idct_transform(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``dct_transform`` (utils_mixer.py:103-114)."""
    t = coeffs.shape[1]
    _, idct_m = get_dct_matrix(t)
    return jnp.einsum("tk,bkd->btd", jnp.asarray(idct_m, coeffs.dtype), coeffs)
