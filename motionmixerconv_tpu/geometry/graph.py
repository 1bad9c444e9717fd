"""AMASS skeleton graph helpers (spatio-temporal adjacency construction).

Parity: amass/dataloader_amass.py:154-213. The reference defines these for a
GCN baseline that no shipped training path invokes; they are provided here
for completeness. Pure numpy (the reference builds the adjacency through
networkx; the same symmetric 0/1 matrix is constructed directly, removing
the dependency), outputs golden-pinned against the executed reference.
"""

from __future__ import annotations

import numpy as np

# 22-joint AMASS edge list (dataloader_amass.py:192-205, incl. the two
# cross edges (1, 16) and (2, 17); the commented-out wrist/head edges are
# omitted exactly as in the reference)
AMASS_EDGES_22 = [
    (0, 1), (0, 2),
    (1, 4), (5, 2),
    (7, 4), (8, 5),
    (7, 10), (8, 11),
    (12, 15),
    (12, 16), (12, 17),
    (16, 18), (19, 17), (20, 18), (21, 19),
    (1, 16), (2, 17),
]


def normalize_A(A: np.ndarray) -> np.ndarray:
    """Symmetric degree normalisation D^-1/2 (A + I) D^-1/2.

    Parity: dataloader_amass.py:154-167, including its quirk that the
    degree is computed AFTER adding self-loops and that D^-1/2 uses the
    dense diagonal matrix's elementwise power (off-diagonal 0^-0.5 = inf
    entries are zeroed, leaving only the diagonal scaling).
    """
    A = np.asarray(A, dtype=np.float64) + np.eye(A.shape[0])
    D = np.diag(np.sum(A, axis=0))
    with np.errstate(divide="ignore"):
        D_inv = D ** -0.5
    D_inv[np.isinf(D_inv)] = 0.0
    return D_inv @ A @ D_inv


def spatio_temporal_graph(
    joints_to_consider: int, temporal_kernel_size: int,
    spatial_adjacency_matrix: np.ndarray,
) -> np.ndarray:
    """Tile a normalized spatial adjacency into (t, J, J) with unit
    self-edges per frame (dataloader_amass.py:173-185). Note the reference
    writes the self-edge first and then OVERWRITES it with the normalized
    value wherever A[i, i] != 0 — reproduced by the masked copy below."""
    J, t = joints_to_consider, temporal_kernel_size
    A = np.asarray(spatial_adjacency_matrix, dtype=np.float64)[:J, :J]
    frame = np.eye(J)
    mask = A != 0
    frame[mask] = A[mask]
    return np.broadcast_to(frame, (t, J, J)).copy()


def get_adj_AMASS(joints_to_consider: int, temporal_kernel_size: int) -> np.ndarray:
    """Normalized spatio-temporal adjacency for the 22-joint AMASS skeleton
    (dataloader_amass.py:191-213). Returns float32 like the reference's
    torch.Tensor. Only joints_to_consider == 22 has a defined edge list,
    matching the reference (which raises NameError otherwise)."""
    if joints_to_consider != 22:
        raise ValueError("only the 22-joint AMASS skeleton has an edge list")
    A = np.zeros((joints_to_consider, joints_to_consider), np.float64)
    for i, j in AMASS_EDGES_22:
        A[i, j] = A[j, i] = 1.0
    return spatio_temporal_graph(
        joints_to_consider, temporal_kernel_size, normalize_A(A)
    ).astype(np.float32)
