"""Golden-value parity tests for the geometry kernels.

Fixtures in tests/golden/*.npz were produced by running the reference torch
implementation on CPU (tools/gen_golden.py). Tolerances are float32-level.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionmixerconv_tpu.geometry import (
    ang2joint,
    expmap2quat,
    expmap2rotmat,
    expmap2xyz,
    fkl,
    load_smpl_skeleton,
    quat2expmap,
    quat_norm_valid,
    rodrigues,
    rotmat2euler,
    rotmat2expmap,
    rotmat2quat,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    return np.load(os.path.join(GOLDEN, name))


class TestRotations:
    def test_expmap2rotmat(self):
        g = _load("rotations.npz")
        R = expmap2rotmat(jnp.asarray(g["r"]))
        np.testing.assert_allclose(R, g["R"], atol=1e-5)

    def test_rotmat2euler(self):
        g = _load("rotations.npz")
        eul = rotmat2euler(jnp.asarray(g["R"]))
        np.testing.assert_allclose(eul, g["eul"], atol=1e-4)

    def test_rotmat2euler_gimbal_lock(self):
        g = _load("rotations.npz")
        eul = rotmat2euler(jnp.asarray(g["R_lock"]))
        np.testing.assert_allclose(eul, g["eul_lock"], atol=1e-5)

    def test_rotmat2quat(self):
        g = _load("rotations.npz")
        q = rotmat2quat(jnp.asarray(g["R"]))
        np.testing.assert_allclose(q, g["quat"], atol=1e-5)

    def test_expmap2quat(self):
        g = _load("rotations.npz")
        q = expmap2quat(jnp.asarray(g["r"]))
        np.testing.assert_allclose(q, g["equat"], atol=1e-5)

    def test_expmap2rotmat_is_orthonormal(self):
        g = _load("rotations.npz")
        R = np.asarray(expmap2rotmat(jnp.asarray(g["r"])))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)

    def test_quat2expmap(self):
        """Golden vs reference quat2expmap (data_utils.py:97-125), incl. the
        identity quaternion and a theta > pi (w < 0) flip case."""
        g = _load("rotations.npz")
        r = quat2expmap(jnp.asarray(g["quats_for_expmap"]))
        np.testing.assert_allclose(r, g["quat2expmap"], atol=1e-5)

    def test_quat_norm_valid_mask(self):
        """The batched replacement for the reference's unit-norm ValueError."""
        g = _load("rotations.npz")
        q = np.asarray(g["quats_for_expmap"])
        assert bool(np.all(quat_norm_valid(jnp.asarray(q))))
        bad = np.concatenate([q, 2.0 * q[:1], 0.5 * q[:1]])
        mask = np.asarray(quat_norm_valid(jnp.asarray(bad)))
        assert not mask[-1] and not mask[-2] and mask[:-2].all()

    def test_rotmat2expmap(self):
        """Golden vs reference rotmat2expmap = quat2expmap(rotmat2quat(R))
        (data_utils.py:73-74)."""
        g = _load("rotations.npz")
        r = rotmat2expmap(jnp.asarray(g["R"]))
        np.testing.assert_allclose(r, g["rotmat2expmap"], atol=1e-4)

    def test_expmap_roundtrip(self):
        """rotmat2expmap(expmap2rotmat(r)) recovers r for |r| in (0, pi)."""
        g = _load("rotations.npz")
        r = np.asarray(g["r"][2:])  # skip the exact-zero / 1e-9 edge rows
        norms = np.linalg.norm(r, axis=-1, keepdims=True)
        r = r / norms * np.clip(norms, 1e-2, np.pi - 1e-2)
        back = rotmat2expmap(expmap2rotmat(jnp.asarray(r)))
        np.testing.assert_allclose(back, r, atol=1e-4)

    def test_vmap_and_jit_compose(self):
        g = _load("rotations.npz")
        r = jnp.asarray(g["r"]).reshape(-1, 1, 3)
        R = jax.jit(jax.vmap(expmap2rotmat))(r)
        np.testing.assert_allclose(R.reshape(-1, 3, 3), g["R"], atol=1e-5)


class TestAmassGraph:
    def test_get_adj_amass_golden(self):
        """Golden vs the executed reference helpers (dataloader_amass.py:
        154-213, run with era shims — see gen_golden.golden_graph)."""
        from motionmixerconv_tpu.geometry import (
            get_adj_AMASS,
            normalize_A,
            spatio_temporal_graph,
        )

        g = _load("amass_graph.npz")
        A22 = np.zeros((22, 22))
        from motionmixerconv_tpu.geometry.graph import AMASS_EDGES_22

        for i, j in AMASS_EDGES_22:
            A22[i, j] = A22[j, i] = 1.0
        np.testing.assert_allclose(normalize_A(A22), g["normalized_A"], atol=1e-12)
        np.testing.assert_allclose(
            spatio_temporal_graph(22, 4, g["normalized_A"]), g["adj_t4"], atol=1e-6
        )
        np.testing.assert_allclose(get_adj_AMASS(22, 4), g["adj_t4"], atol=1e-6)

    def test_isolated_joints_have_self_edges_only(self):
        from motionmixerconv_tpu.geometry import get_adj_AMASS

        adj = get_adj_AMASS(22, 2)
        for j in (3, 6, 9, 13, 14):  # commented-out joints in the edge list
            row = adj[0, j]
            assert row[j] == 1.0 and np.count_nonzero(row) == 1


class TestForwardKinematics:
    def test_fkl_matches_reference(self):
        g = _load("fkl.npz")
        xyz = fkl(jnp.asarray(g["frames"]))
        np.testing.assert_allclose(xyz, g["xyz"], atol=2e-3)  # positions in mm

    def test_expmap2xyz_jit(self):
        g = _load("fkl.npz")
        xyz = expmap2xyz(jnp.asarray(g["frames"]))
        np.testing.assert_allclose(xyz, g["xyz"], atol=2e-3)

    def test_root_children_keep_rest_offset(self):
        g = _load("fkl.npz")
        xyz = np.asarray(fkl(jnp.asarray(g["frames"])))
        from motionmixerconv_tpu.geometry.forward_kinematics import h36m_skeleton

        skel = h36m_skeleton()
        for j in np.where(skel.parent == 0)[0]:
            np.testing.assert_allclose(
                xyz[:, j], np.broadcast_to(skel.offset[j], xyz[:, j].shape), atol=1e-6
            )


class TestSmpl:
    def test_ang2joint_matches_reference(self):
        g = _load("ang2joint.npz")
        fn = g["poses"].shape[0]
        p3d0 = jnp.asarray(np.repeat(g["p3d0"], fn, axis=0))
        out = ang2joint(p3d0, jnp.asarray(g["poses"]), g["parents"])
        np.testing.assert_allclose(out, g["xyz"], atol=1e-5)

    def test_rodrigues_zero_pose_is_identity(self):
        R = rodrigues(jnp.zeros((4, 3)))
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)

    def test_skeleton_asset(self):
        p3d0, parents = load_smpl_skeleton()
        assert p3d0.shape == (1, 52, 3)
        assert parents.shape == (52,)
        assert parents[0] == -1
