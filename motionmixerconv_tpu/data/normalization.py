"""SRNN-legacy normalization utilities.

Parity with the reference's dead human-motion-prediction block
(h36m/utils/data_utils.py:128-277): ``unNormalizeData`` (:128-166),
``revert_output_format`` (:169-195), ``normalize_data`` (:218-248) and
``normalization_stats`` (:251-277). None of these has a call site in the
reference — they are SRNN-era leftovers — but the framework's completeness
standard is to port every defined symbol of the capability surface (the
equally-dead DCT helpers, masking augs and CMU loaders are ported too), so
they live here as plain numpy host-side utilities, golden-pinned against the
executed reference (tests/golden/normalization.npz).

Documented fix (DESIGN.md §5): the reference's ``revert_output_format``
iterates with Python-2 ``xrange`` (data_utils.py:192) and therefore raises
``NameError`` on any Python 3 — the loop is ``range`` here, everything else
is semantics-identical.
"""

from __future__ import annotations

import numpy as np


def normalization_stats(complete_data: np.ndarray):
    """Mean/std over frames + the constant-dimension split.

    Parity: data_utils.py:251-277 — dimensions with std < 1e-4 are "ignored"
    and their std is forced to 1.0 so the later divide is a no-op.

    Args:
        complete_data: (N, D) matrix (reference: D=99 expmap frames).
    Returns:
        (data_mean (D,), data_std (D,), dimensions_to_ignore list,
        dimensions_to_use list) — the index containers are Python lists of
        ints exactly like the reference's ``.extend(list(np.where(...)))``.
    """
    data_mean = np.mean(complete_data, axis=0)
    data_std = np.std(complete_data, axis=0)
    dimensions_to_ignore = list(np.where(data_std < 1e-4)[0])
    dimensions_to_use = list(np.where(data_std >= 1e-4)[0])
    data_std = data_std.copy()
    data_std[dimensions_to_ignore] = 1.0
    return data_mean, data_std, dimensions_to_ignore, dimensions_to_use


def normalize_data(data: dict, data_mean: np.ndarray, data_std: np.ndarray,
                   dim_to_use, actions, one_hot: bool) -> dict:
    """Z-score every sequence in ``data`` and keep only ``dim_to_use``.

    Parity: data_utils.py:218-248. ``data`` is a dict of (N, D) arrays; in
    the one-hot branch the pose part is hardcoded to the first 99 columns
    and the trailing ``len(actions)`` one-hot columns are passed through
    un-normalized, exactly like the reference.
    """
    data_out = {}
    n_actions = len(actions)
    if not one_hot:
        for key in data:
            normed = (data[key] - data_mean) / data_std
            data_out[key] = normed[:, dim_to_use]
    else:
        for key in data:
            normed = (data[key][:, 0:99] - data_mean) / data_std
            data_out[key] = np.hstack(
                (normed[:, dim_to_use], data[key][:, -n_actions:]))
    return data_out


def unNormalizeData(normalized_data: np.ndarray, data_mean: np.ndarray,
                    data_std: np.ndarray, dimensions_to_ignore, actions,
                    one_hot: bool) -> np.ndarray:
    """Invert :func:`normalize_data` back to the full-D frame layout.

    Parity: data_utils.py:128-166 — ignored dimensions come back as
    ``data_mean[ignored]`` (the scatter writes zeros there, then the
    ``* std + mean`` affine runs over ALL columns); with ``one_hot`` the
    trailing ``len(actions)`` columns of the input are dropped.
    Output dtype is float32 like the reference's preallocated buffer.
    """
    T = normalized_data.shape[0]
    D = data_mean.shape[0]
    ignore = set(int(i) for i in np.asarray(dimensions_to_ignore).ravel())
    dimensions_to_use = np.array([i for i in range(D) if i not in ignore])

    orig_data = np.zeros((T, D), dtype=np.float32)
    if one_hot:
        orig_data[:, dimensions_to_use] = normalized_data[:, :-len(actions)]
    else:
        orig_data[:, dimensions_to_use] = normalized_data
    return orig_data * data_std.reshape(1, D) + data_mean.reshape(1, D)


def revert_output_format(poses, data_mean: np.ndarray, data_std: np.ndarray,
                         dim_to_ignore, actions, one_hot: bool):
    """Seq-major model-output list → list of per-batch unnormalized arrays.

    Parity: data_utils.py:169-195 — input is a length-``seq_len`` list of
    (batch, dim) steps; output is a length-``batch`` list of (seq_len, D)
    unnormalized pose arrays. Documented fix: the reference's loop uses
    Python-2 ``xrange`` (:192) and crashes with NameError on Python 3.
    """
    seq_len = len(poses)
    if seq_len == 0:
        return []
    batch_size, dim = poses[0].shape
    poses_out = np.concatenate(poses).reshape(seq_len, batch_size, dim)
    poses_out = np.transpose(poses_out, [1, 0, 2])
    return [
        unNormalizeData(poses_out[i], data_mean, data_std, dim_to_ignore,
                        actions, one_hot)
        for i in range(poses_out.shape[0])
    ]
