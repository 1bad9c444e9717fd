"""Tests for the long-tail capability items (DCT, augmentations, CMU
skeleton, raw AIS viewer, profiling, study analysis)."""

import os

import jax
import jax.numpy as jnp
import numpy as np


def test_dct_roundtrip_and_reference_construction():
    from motionmixerconv_tpu.geometry import dct_transform, get_dct_matrix, idct_transform

    dct_m, idct_m = get_dct_matrix(10)
    np.testing.assert_allclose(dct_m @ idct_m, np.eye(10), atol=1e-10)
    # reference loop construction parity
    n = 10
    ref = np.eye(n)
    for k in range(n):
        for i in range(n):
            w = np.sqrt(2 / n) if k != 0 else np.sqrt(1 / n)
            ref[k, i] = w * np.cos(np.pi * (i + 1 / 2) * k / n)
    np.testing.assert_allclose(dct_m, ref, atol=1e-12)

    seq = jnp.asarray(np.random.RandomState(0).randn(3, 10, 6).astype(np.float32))
    rec = idct_transform(dct_transform(seq))
    np.testing.assert_allclose(rec, seq, atol=1e-4)


def test_masking_augmentations():
    from motionmixerconv_tpu.data.augment import mask_joints, mask_sequence

    seq = jnp.ones((2, 10, 66))
    out = mask_sequence(jax.random.PRNGKey(0), seq, mframes=3)
    zero_frames = np.where(np.all(np.asarray(out) == 0, axis=(0, 2)))[0]
    assert 1 <= len(zero_frames) <= 3

    out = mask_joints(jax.random.PRNGKey(1), seq, mjoints=4)
    flat = np.asarray(out)[0, 0].reshape(-1, 3)
    zero_joints = np.where(np.all(flat == 0, axis=1))[0]
    assert 1 <= len(zero_joints) <= 4
    # whole triplets are zeroed
    for j in zero_joints:
        assert np.all(np.asarray(out)[:, :, j * 3 : j * 3 + 3] == 0)


def test_cmu_skeleton_fk():
    from motionmixerconv_tpu.geometry import cmu_skeleton, fkl

    skel = cmu_skeleton()
    assert skel.num_joints == 38
    frames = jnp.zeros((2, 3 + 38 * 3))
    xyz = fkl(frames, skeleton=skel)
    assert xyz.shape == (2, 38, 3)
    assert np.all(np.isfinite(np.asarray(xyz)))


def test_raw_ais_viewer(tmp_path):
    from motionmixerconv_tpu.data import fixtures
    from motionmixerconv_tpu.viz.ais_raw import visualize_raw_action

    fixtures.make_ais_corpus(str(tmp_path), actions=["act"], n_frames=30,
                             fail_frames=(5,), seed=1)
    out = str(tmp_path / "act.gif")
    visualize_raw_action(str(tmp_path), "act", out, max_frames=6, stride=5)
    assert os.path.getsize(out) > 1000


def test_profiling_helpers(tmp_path):
    from motionmixerconv_tpu.profiling import ThroughputMeter, profile_trace

    meter = ThroughputMeter()
    meter.add(100)
    assert meter.seq_per_sec > 0
    with profile_trace(str(tmp_path / "trace")):
        jnp.ones((8, 8)).sum().block_until_ready()
    assert os.path.isdir(str(tmp_path / "trace"))


def test_study_analysis(tmp_path):
    from motionmixerconv_tpu.sweep import GridSampler, Study
    from motionmixerconv_tpu.sweep.analysis import (
        best_trials_table,
        kernel_grid_table,
        load_study_dataframe,
    )

    sdir = str(tmp_path / "study")
    os.makedirs(sdir)

    def objective(trial):
        kx = trial.suggest_int("kernel1_x_Time", 1, 5, step=4)
        ky = trial.suggest_int("kernel1_y_Pose", 1, 5, step=4)
        return float(kx * 10 + ky)

    study = Study("study", storage=f"sqlite:///{sdir}/results.db",
                  sampler=GridSampler())
    study.optimize(objective, n_trials=10)
    df = load_study_dataframe(sdir)
    assert len(df) == 4
    grid = kernel_grid_table(df)
    assert grid.loc[1, 1] == 11.0 and grid.loc[5, 5] == 55.0
    assert best_trials_table(df).iloc[0]["values_0"] == 11.0
