"""SMPL forward kinematics (AMASS ingest path), TPU-first.

JAX equivalent of the reference's ``ang2joint`` torch chain
(utils/ang2joint.py:9-56): axis-angle SMPL pose -> joint xyz through a
per-joint rigid-transform composition. The reference builds 4x4 homogeneous
transforms in a Python loop over joints; here the homogeneous padding is
dropped entirely — we carry (rotation, translation) pairs and compose them as
``(R_p @ R_i, R_p @ t_i + t_p)``, unrolled over the static parent table so XLA
sees a straight-line program of batched MXU matmuls.
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

from .rotations import rodrigues

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")


@functools.lru_cache(maxsize=None)
def load_smpl_skeleton() -> tuple[np.ndarray, np.ndarray]:
    """Rest-pose SMPL joints and parent table.

    Same binary asset the reference loads at amass/dataloader_amass.py:79-84.

    Returns:
        p3d0: (1, 52, 3) rest joint positions.
        parents: (52,) parent indices (-1 for root).
    """
    with np.load(os.path.join(_ASSET_DIR, "smpl_skeleton.npz")) as f:
        return f["p3d0"].astype(np.float32), f["parents"].astype(np.int32)


def ang2joint(
    p3d0: jnp.ndarray, pose: jnp.ndarray, parents: np.ndarray
) -> jnp.ndarray:
    """Axis-angle SMPL pose -> joint positions.

    Parity with reference ``ang2joint`` (utils/ang2joint.py:9-56). The joint
    position extracted from each composed homogeneous transform is its
    translation column, so we compose (R, t) pairs directly:

        t_i_global = R_parent_global @ (J_i - J_parent) + t_parent_global
        R_i_global = R_parent_global @ R_i_local

    Args:
        p3d0: (B, J, 3) rest-pose joint positions.
        pose: (B, J, 3) axis-angle per-joint rotations.
        parents: (J,) static parent-index table (-1 for root).
    Returns:
        (B, J, 3) posed joint positions.
    """
    jnum = int(parents.shape[0])
    R_local = rodrigues(pose)  # (B, J, 3, 3), single fused batch

    R_glob: list[jnp.ndarray] = [None] * jnum
    t_glob: list[jnp.ndarray] = [None] * jnum
    R_glob[0] = R_local[:, 0]
    t_glob[0] = p3d0[:, 0]
    for i in range(1, jnum):
        p = int(parents[i])
        bone = p3d0[:, i] - p3d0[:, p]  # (B, 3)
        # R_p @ bone: batched matvec -> (B, 3)
        t_glob[i] = jnp.einsum("bij,bj->bi", R_glob[p], bone) + t_glob[p]
        R_glob[i] = R_glob[p] @ R_local[:, i]

    return jnp.stack(t_glob, axis=1)
