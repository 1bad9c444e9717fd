"""Windowed-corpus representation and samplers, TPU-first.

The reference serves (input_n+output_n)-frame windows through
``torch.utils.data.Dataset`` + multiprocess ``DataLoader`` workers
(train_mixer_h36m.py:95-98). Here the whole preprocessed corpus lives as one
device array and a window is a gather — ``frames[start + arange(seq_len)]`` —
performed *inside* the jitted train step, so there are no host->device copies
per step at all and no worker processes.

``find_indices_256`` / ``find_indices_srnn`` reproduce the reference's
SRNN-seeded test-window selection bit-for-bit (same numpy RandomState
consumption order; h36m/utils/data_utils.py:600-663).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SRNN_SEED = 1234567890  # h36m/utils/data_utils.py:611,643


def _find_indices(
    frame_num1: int, frame_num2: int, seq_len: int, input_n: int, count: int
) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(SRNN_SEED)
    T1 = frame_num1 - 150
    T2 = frame_num2 - 150
    idxo1, idxo2 = [], []
    for _ in range(count):
        idx_ran1 = rng.randint(16, T1)
        idx_ran2 = rng.randint(16, T2)
        idxo1.append(np.arange(idx_ran1 + 50 - input_n, idx_ran1 + 50 - input_n + seq_len))
        idxo2.append(np.arange(idx_ran2 + 50 - input_n, idx_ran2 + 50 - input_n + seq_len))
    return np.stack(idxo1), np.stack(idxo2)


def find_indices_256(frame_num1, frame_num2, seq_len, input_n=10):
    """128+128 SRNN-seeded test windows (h36m/utils/data_utils.py:600-629)."""
    return _find_indices(frame_num1, frame_num2, seq_len, input_n, 128)


def find_indices_srnn(frame_num1, frame_num2, seq_len, input_n=10):
    """4+4 SRNN-seeded test windows (h36m/utils/data_utils.py:632-663)."""
    return _find_indices(frame_num1, frame_num2, seq_len, input_n, 4)


@dataclasses.dataclass
class WindowedCorpus:
    """A preprocessed corpus: concatenated frames + window start indices.

    ``frames`` is (N_total, D) over all sequences laid end to end;
    ``window_starts`` are global frame indices such that
    ``frames[s : s + seq_len]`` never crosses a sequence boundary.
    """

    frames: np.ndarray
    window_starts: np.ndarray
    seq_len: int

    def __len__(self) -> int:
        return int(self.window_starts.shape[0])

    def __getitem__(self, item: int) -> np.ndarray:
        s = int(self.window_starts[item])
        return self.frames[s : s + self.seq_len]

    def device_put(self, sharding=None) -> "WindowedCorpus":
        """Move frames to device (optionally with an explicit sharding)."""
        frames = jax.device_put(jnp.asarray(self.frames), sharding)
        return WindowedCorpus(frames, self.window_starts, self.seq_len)


def gather_windows(
    frames: jnp.ndarray, starts: jnp.ndarray, seq_len: int
) -> jnp.ndarray:
    """Gather (B, seq_len, D) windows from a (N, D) corpus. jit-safe.

    Two exact-value formulations (selectable via ``MMC_GATHER_IMPL``,
    measured by ``tools/probe.py gather``):

    - ``take`` (default): one (B, seq_len) row-index gather —
      B*seq_len independent D-row transfers (384 B at D=96).
    - ``dslice``: ``vmap(dynamic_slice)`` — B contiguous (seq_len, D)
      block transfers (~13 KB each). Windows ARE contiguous frame runs,
      so the block form tells XLA what the row form hides.

    Both clamp out-of-range indices (gather clamps per row, dynamic_slice
    clamps the start); production starts are always in range
    (``batch_starts`` pads with window 0).
    """
    if os.environ.get("MMC_GATHER_IMPL", "take") == "take":
        idx = starts[:, None] + jnp.arange(seq_len)[None, :]
        return frames[idx]
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(
            frames, (s,) + (0,) * (frames.ndim - 1),
            (seq_len,) + frames.shape[1:])
    )(starts)


def batch_starts(
    corpus: WindowedCorpus,
    batch_size: int,
    *,
    shuffle: bool,
    seed: int | None = None,
    pad_to_full: bool = True,
    order: np.ndarray | None = None,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (starts, weight) batches covering every window exactly once.

    The reference keeps torch DataLoader's final ragged batch; under jit we
    need static shapes, so the last batch is padded up to ``batch_size`` by
    repeating window 0 with weight 0. ``weight`` is (B,) float32 in {0, 1};
    loss/metric accumulation weighted by it reproduces ragged-batch averages
    exactly.

    ``order`` overrides the shuffle with an explicit window permutation —
    used to replay a reference DataLoader's exact batch stream for lockstep
    convergence-parity runs (tools/parity_runs.py).
    """
    if order is not None:
        order = np.asarray(order)
        if order.shape[0] != len(corpus):
            raise ValueError(
                f"order has {order.shape[0]} entries for {len(corpus)} windows"
            )
    else:
        order = np.arange(len(corpus))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
    starts = corpus.window_starts[order]
    n = len(order)
    for lo in range(0, n, batch_size):
        chunk = starts[lo : lo + batch_size]
        w = np.ones(len(chunk), dtype=np.float32)
        if pad_to_full and len(chunk) < batch_size:
            pad = batch_size - len(chunk)
            chunk = np.concatenate([chunk, np.zeros(pad, dtype=chunk.dtype)])
            w = np.concatenate([w, np.zeros(pad, dtype=np.float32)])
        yield chunk.astype(np.int32), w
