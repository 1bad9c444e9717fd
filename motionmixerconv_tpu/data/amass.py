"""AMASS data pipeline: SMPL npz archives -> device-resident windowed corpus.

Parity with amass/dataloader_amass.py: walks ``{dataset}/{subject}/{act}.npz``
files per split, integer-resamples each mocap to 25 fps, zeroes the global
rotation, and runs SMPL forward kinematics. The reference runs ``ang2joint``
per file with ``.cuda()`` round trips (dataloader_amass.py:122-129); here all
resampled frames across all files are concatenated and converted in ONE
batched jit call.

Stored frames are the flattened (52*3,) joint positions; the trainer selects
``AMASS_JOINT_USED`` (joints 4..21 -> 54 dims).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import ang2joint, load_smpl_skeleton
from .constants import AMASS_SPLITS, AMASS_TARGET_FPS
from .windows import WindowedCorpus


class AMASSDataset(WindowedCorpus):
    """AMASS windowed corpus.

    Args:
        data_dir: root containing the AMASS sub-dataset directories.
        input_n / output_n / skip_rate: window geometry.
        split: 0 train / 1 val / 2 test (directory lists in AMASS_SPLITS).
    """

    def __init__(
        self,
        data_dir: str,
        input_n: int,
        output_n: int,
        skip_rate: int,
        actions=None,
        split: int = 0,
    ):
        del actions  # parity: reference ignores it (dataloader_amass.py:20)
        self.split = split
        self.in_n = input_n
        self.out_n = output_n
        seq_len = input_n + output_n

        p3d0_np, parents = load_smpl_skeleton()

        sequences: list[np.ndarray] = []  # raw resampled poses per file
        self.keys: list[tuple] = []
        for ds in AMASS_SPLITS[split]:
            ds_path = os.path.join(data_dir, ds)
            if not os.path.isdir(ds_path):
                continue
            for sub in sorted(os.listdir(ds_path)):
                sub_path = os.path.join(ds_path, sub)
                if not os.path.isdir(sub_path):
                    continue
                for act in sorted(os.listdir(sub_path)):
                    if not act.endswith(".npz"):
                        continue
                    with np.load(os.path.join(sub_path, act)) as pose_all:
                        if "poses" not in pose_all.files:
                            continue
                        poses = pose_all["poses"]
                        frame_rate = float(pose_all["mocap_framerate"])
                    sample_rate = int(frame_rate // AMASS_TARGET_FPS)
                    poses = poses[::sample_rate].astype(np.float32)
                    fn = poses.shape[0]
                    if fn < seq_len:
                        continue
                    poses = poses.reshape(fn, -1, 3)
                    poses[:, 0] = 0.0  # remove global rotation (:125)
                    sequences.append(poses)
                    self.keys.append((ds, sub, act))

        if not sequences:
            raise FileNotFoundError(f"no AMASS npz files under {data_dir}")

        lengths = np.array([s.shape[0] for s in sequences])
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        local = [np.arange(0, n - seq_len + 1, skip_rate) for n in lengths]
        window_starts = np.concatenate(
            [off + ls for off, ls in zip(offsets, local)]
        ).astype(np.int64)

        all_poses = np.concatenate(sequences, axis=0)  # (N, 52, 3)
        n_total = all_poses.shape[0]

        @jax.jit
        def _fk(poses_batch):
            p3d0 = jnp.broadcast_to(
                jnp.asarray(p3d0_np), (poses_batch.shape[0],) + p3d0_np.shape[1:]
            )
            return ang2joint(p3d0, poses_batch, parents)

        p3d = np.asarray(_fk(jnp.asarray(all_poses)), dtype=np.float32)
        frames = p3d.reshape(n_total, -1)  # (N, 156)

        super().__init__(frames=frames, window_starts=window_starts, seq_len=seq_len)

    def __getitem__(self, item: int) -> np.ndarray:
        """(seq_len, 52, 3), matching the reference item shape."""
        flat = super().__getitem__(item)
        return flat.reshape(self.seq_len, -1, 3)
