"""End-to-end smokes for the three study drivers (sweep/{conv,mlp,autoreg}_study).

The engine itself is covered by test_sweep_viz; these drive each study's
main() — sampler wiring, Objective glue, user_attrs, sqlite persistence —
with one real trial on tiny synthetic corpora. Slow-marked (each trial is a
real training run on the CPU mesh).
"""

import os

import numpy as np
import pytest

from motionmixerconv_tpu.data import fixtures
from motionmixerconv_tpu.data.constants import AIS_ALL_ACTIONS


@pytest.fixture(scope="module")
def ais_dir(tmp_path_factory):
    td = tmp_path_factory.mktemp("ais_study")
    fixtures.make_ais_corpus(str(td), actions=AIS_ALL_ACTIONS, n_frames=300,
                             seed=4)
    return str(td)


@pytest.fixture(scope="module")
def h36m_dir(tmp_path_factory):
    td = tmp_path_factory.mktemp("h36m_study")
    fixtures.make_h36m_corpus(str(td), n_frames=340, seed=5)
    return str(td)


@pytest.mark.slow
def test_conv_study_ais_trial(ais_dir, tmp_path):
    """ConvMixer study, AIS branch (conv_optuna_main.py:333-335): single-
    objective, per-action user_attrs, sqlite storage."""
    from motionmixerconv_tpu.sweep import conv_study

    study_dir = str(tmp_path / "s1")
    study = conv_study.main([
        "--data_dir", ais_dir, "--study_dir", study_dir,
        "--dataset_type", "ais", "--n_trials", "1", "--n_epochs", "1",
        "--skip_rate", "2",
    ])
    (trial,) = study.trials
    assert np.isfinite(trial.values).all()
    assert "test_loss_mpjpe" in trial.user_attrs
    assert any(k.endswith("/auc_pck") for k in trial.user_attrs)
    assert os.path.exists(os.path.join(study_dir, "results.db"))


@pytest.mark.slow
def test_mlp_study_trial(h36m_dir, tmp_path):
    """MlpMixer TPE study (the working version of the reference's broken
    optuna_main.py): suggested hyperparameters drive a real run_h36m."""
    from motionmixerconv_tpu.sweep import mlp_study

    study_dir = str(tmp_path / "s2")
    study = mlp_study.main([
        "--data_dir", h36m_dir, "--study_dir", study_dir,
        "--n_trials", "1", "--n_epochs", "1", "--skip_rate", "5",
        "--actions_to_consider", "walking", "--output_n", "10",
    ])
    (trial,) = study.trials
    assert np.isfinite(trial.values).all()
    assert {"hidden_dim", "num_blocks", "lr"} <= set(trial.params)
    assert os.path.exists(os.path.join(study_dir, "results.db"))


@pytest.mark.slow
def test_autoreg_study_ais_trial(ais_dir, tmp_path):
    """Autoregressive study, AIS branch (conv_optuna_autoregressive.py with
    the window/TF search-space args)."""
    from motionmixerconv_tpu.sweep import autoreg_study

    study_dir = str(tmp_path / "s3")
    study = autoreg_study.main([
        "--data_dir", ais_dir, "--study_dir", study_dir,
        "--dataset_type", "ais", "--n_trials", "1", "--n_epochs", "2",
        "--n_epochs_teacher_forcing", "1", "--skip_rate", "2",
    ])
    (trial,) = study.trials
    assert np.isfinite(trial.values).all()
    assert "test_loss_mpjpe" in trial.user_attrs
    assert os.path.exists(os.path.join(study_dir, "results.db"))
