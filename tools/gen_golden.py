"""Generate golden numeric fixtures from the reference implementation.

Runs the reference's torch/numpy kernels on CPU (with ``.cuda()`` patched to a
no-op, since the reference hardcodes CUDA placement) and stores their outputs
as ``tests/golden/*.npz``. The checked-in fixtures make the test suite
self-contained; this script only needs re-running if tolerance targets change.

Usage:  python tools/gen_golden.py   (requires /root/reference to be mounted)
"""

import os
import sys

import numpy as np
import torch

REFERENCE = "/root/reference"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")

if not os.path.isdir(REFERENCE):
    sys.exit("reference repo not available; golden fixtures cannot be regenerated")

# The reference hardcodes .cuda() inside its kernels; run them on CPU.
torch.Tensor.cuda = lambda self, *a, **k: self
_orig_eye = torch.eye


def _seeded(seed: int) -> np.random.RandomState:
    return np.random.RandomState(seed)


sys.path.insert(0, REFERENCE)
sys.path.insert(0, os.path.join(REFERENCE, "h36m"))

from utils import data_utils as ref_du  # noqa: E402
from utils import forward_kinematics as ref_fk  # noqa: E402
from utils import ang2joint as ref_a2j  # noqa: E402

os.makedirs(OUT_DIR, exist_ok=True)


def golden_rotations():
    rs = _seeded(42)
    r = rs.randn(257, 3).astype(np.float32)
    # include exact zeros and tiny vectors (edge cases)
    r[0] = 0.0
    r[1] = 1e-9
    rt = torch.from_numpy(r)
    R = ref_du.expmap2rotmat_torch(rt)
    eul = ref_du.rotmat2euler_torch(R)
    quat = ref_du.rotmat2quat_torch(R)
    equat = ref_du.expmap2quat_torch(rt)

    # gimbal-lock specials: rotations with R[0,2] == +/-1 (y-rotation of +/-pi/2)
    lock = np.array([[0.0, np.pi / 2, 0.0], [0.0, -np.pi / 2, 0.0]], dtype=np.float32)
    R_lock = ref_du.expmap2rotmat_torch(torch.from_numpy(lock))
    # force exact +-1 in the [0, 2] entry to hit the special-case branch
    R_lock_fixed = R_lock.clone()
    R_lock_fixed[0, 0, 2] = -1.0
    R_lock_fixed[1, 0, 2] = 1.0
    eul_lock = ref_du.rotmat2euler_torch(R_lock_fixed)

    np.savez(
        os.path.join(OUT_DIR, "rotations.npz"),
        r=r,
        R=R.numpy(),
        eul=eul.numpy(),
        quat=quat.numpy(),
        equat=equat.numpy(),
        R_lock=R_lock_fixed.numpy(),
        eul_lock=eul_lock.numpy(),
    )
    print("rotations.npz written")


def golden_fkl():
    # The two embedded expmap vectors from the reference FK smoke harness
    # (h36m/utils/forward_kinematics.py:252-277) plus random frames.
    parent, offset, rotInd, expmapInd = ref_fk._some_variables()
    rs = _seeded(7)
    frames = rs.randn(64, 99).astype(np.float32) * 0.4
    frames[:, 0:6] = 0.0
    xyz_t = ref_fk.fkl_torch(
        torch.from_numpy(frames), parent, offset, rotInd, expmapInd
    )
    np.savez(
        os.path.join(OUT_DIR, "fkl.npz"),
        frames=frames,
        xyz=xyz_t.numpy(),
    )
    print("fkl.npz written")


def golden_ang2joint():
    skel = np.load(os.path.join(REFERENCE, "utils/body_models/smpl_skeleton.npz"))
    p3d0 = torch.from_numpy(skel["p3d0"]).float()
    parents = skel["parents"]
    parent = {i: parents[i] for i in range(len(parents))}
    rs = _seeded(11)
    fn = 33
    poses = rs.randn(fn, len(parents), 3).astype(np.float32) * 0.3
    poses[:, 0] = 0.0  # reference zeroes global rotation (dataloader_amass.py:125)
    p3d0_rep = p3d0.repeat([fn, 1, 1])

    # patch the RNG-eps hack in rodrigues to a deterministic zero so the golden
    # outputs are reproducible; the jitter is below float32 resolution anyway.
    orig_normal_ = torch.Tensor.normal_

    def _zero_normal(self, *a, **k):
        return self.fill_(1e-8)

    torch.Tensor.normal_ = _zero_normal
    try:
        out = ref_a2j.ang2joint(p3d0_rep, torch.from_numpy(poses), parent)
    finally:
        torch.Tensor.normal_ = orig_normal_
    np.savez(
        os.path.join(OUT_DIR, "ang2joint.npz"),
        poses=poses,
        p3d0=p3d0.numpy(),
        parents=parents,
        xyz=out.numpy(),
    )
    print("ang2joint.npz written")


def golden_find_indices():
    i256 = ref_du.find_indices_256(1500, 1700, 35, input_n=10)
    isrnn = ref_du.find_indices_srnn(1500, 1700, 35, input_n=10)
    np.savez(
        os.path.join(OUT_DIR, "find_indices.npz"),
        i256_1=i256[0], i256_2=i256[1], isrnn_1=isrnn[0], isrnn_2=isrnn[1],
    )
    print("find_indices.npz written")


if __name__ == "__main__":
    golden_rotations()
    golden_fkl()
    golden_ang2joint()
    golden_find_indices()
