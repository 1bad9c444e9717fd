"""End-to-end CLI-runner smokes for the paths no other test drives.

The convergence-parity tests (test_parity_runs.py, slow) exercise
run_h36m/mpjpe, run_amass and run_h36m_autoregressive; here the remaining
runner surfaces — H36M angle loss (euler eval chain), H36M delta_x
(velocity decoding), AIS direct and AIS autoregressive — each run one real
epoch through their actual CLI main() on tiny synthetic corpora, asserting
finite history and the reference-shaped artifacts (TB events, metrics
JSONL, resumable checkpoint).
"""

import glob
import os

import numpy as np
import pytest

from motionmixerconv_tpu.data import fixtures
from motionmixerconv_tpu.data.constants import AIS_ALL_ACTIONS


@pytest.fixture(scope="module")
def h36m_dir(tmp_path_factory):
    td = tmp_path_factory.mktemp("h36m_smoke")
    # all 15 actions: split-0 loading mirrors the reference and reads every
    # action regardless of --actions_to_consider (dataset_h36m.py:75-82)
    fixtures.make_h36m_corpus(str(td), n_frames=340, seed=3)
    return str(td)


@pytest.fixture(scope="module")
def ais_dir(tmp_path_factory):
    td = tmp_path_factory.mktemp("ais_smoke")
    fixtures.make_ais_corpus(str(td), actions=AIS_ALL_ACTIONS, n_frames=300,
                             seed=4)
    return str(td)


def _assert_artifacts(save_path):
    run_dirs = [d for d in glob.glob(os.path.join(save_path, "*"))
                if os.path.isdir(d)]
    assert run_dirs, f"no run dir under {save_path}"
    d = run_dirs[0]
    assert glob.glob(os.path.join(d, "events.out.tfevents.*"))
    assert os.path.exists(os.path.join(d, "metrics.jsonl"))
    assert os.path.exists(os.path.join(d, "model.ckpt"))


def _finite(history):
    for key in ("train", "val", "test"):
        assert history[key], f"empty history[{key!r}]"
        assert np.isfinite(history[key]).all(), (key, history[key])


def test_h36m_angle_runner(h36m_dir, tmp_path):
    """Angle loss: H36M_Dataset_Angle windows, L1 loss on 48 dims, euler +
    joint-angle eval chain (train_mixer_h36m.py angle branch)."""
    from motionmixerconv_tpu.cli import train_mixer_h36m

    save = str(tmp_path / "runs")
    history = train_mixer_h36m.main([
        "--data_dir", h36m_dir, "--save_path", save,
        "--loss_type", "angle", "--n_epochs", "1", "--skip_rate", "5",
        "--num_blocks", "2", "--hidden_dim", "24",
        "--actions_to_consider", "walking", "--batch_size", "128",
    ])
    _finite(history)
    assert np.isfinite(history["metrics"]["euler_angle"]).all()
    assert np.isfinite(history["metrics"]["joint_angle"]).all()
    _assert_artifacts(save)


def test_h36m_delta_x_runner(h36m_dir, tmp_path):
    """delta_x: the model predicts frame-to-frame deltas, decoded against the
    last input frame (train_mixer_h36m.py:161-176 delta branch)."""
    from motionmixerconv_tpu.cli import train_mixer_h36m

    save = str(tmp_path / "runs")
    history = train_mixer_h36m.main([
        "--data_dir", h36m_dir, "--save_path", save,
        "--loss_type", "mpjpe", "--delta_x", "1", "--n_epochs", "1",
        "--skip_rate", "5", "--num_blocks", "2", "--hidden_dim", "24",
        "--actions_to_consider", "walking", "--batch_size", "128",
    ])
    _finite(history)
    _assert_artifacts(save)


def test_ais_runner(ais_dir, tmp_path):
    """AIS direct: canonicalized ewm-smoothed keypoints, meter-scale loss with
    the x1000 report quirk (train_mixer_ais.py:47-292)."""
    from motionmixerconv_tpu.cli import train_mixer_ais

    save = str(tmp_path / "runs")
    history = train_mixer_ais.main([
        "--data_dir", ais_dir, "--save_path", save,
        "--n_epochs", "1", "--num_blocks", "2", "--hidden_dim", "24",
        "--batch_size", "128",
    ])
    _finite(history)
    assert np.isfinite(history["metrics"]["auc_pck"]).all()
    _assert_artifacts(save)


def test_ais_autoreg_runner(ais_dir, tmp_path):
    """AIS autoregressive: rollout trainer over AIS windows with the
    no-/1000 AUC quirk (train_autoreg_mixer_ais.py:261-268)."""
    from motionmixerconv_tpu.cli import train_autoreg_mixer_ais

    save = str(tmp_path / "runs")
    history = train_autoreg_mixer_ais.main([
        "--data_dir", ais_dir, "--save_path", save,
        "--n_epochs", "2", "--n_epochs_teacher_forcing", "1",
        "--num_blocks", "2", "--hidden_dim", "24", "--batch_size", "128",
    ])
    _finite(history)
    _assert_artifacts(save)


def test_h36m_autoreg_angle_runner(h36m_dir, tmp_path):
    """Autoregressive angle branch: L1 rollout loss on 48 dims, euler +
    joint-angle stitched-frame eval (test_angle_autoregressive,
    train_autoreg_mixer_h36m.py:360-412)."""
    from motionmixerconv_tpu.cli import train_autoreg_mixer_h36m

    save = str(tmp_path / "runs")
    history = train_autoreg_mixer_h36m.main([
        "--data_dir", h36m_dir, "--save_path", save,
        "--loss_type", "angle", "--n_epochs", "2",
        "--n_epochs_teacher_forcing", "1", "--skip_rate", "5",
        "--num_blocks", "2", "--hidden_dim", "24", "--conv_nChan", "2",
        "--actions_to_consider", "walking", "--batch_size", "128",
    ])
    _finite(history)
    assert np.isfinite(history["metrics"]["euler_angle"]).all()
    assert np.isfinite(history["metrics"]["joint_angle"]).all()
    _assert_artifacts(save)


def test_epoch_callback_reports_and_prunes(h36m_dir, tmp_path):
    """The runners' epoch_callback hook: called once per epoch with the
    accumulated history (the study drivers report intermediate values
    through it), and a raised TrialPruned stops the run mid-training
    after that epoch's checkpoint was saved."""
    from motionmixerconv_tpu.cli._runner import run_h36m
    from motionmixerconv_tpu.sweep import TrialPruned
    from motionmixerconv_tpu.sweep.conv_study import parse_args

    args = parse_args([
        "--data_dir", h36m_dir, "--n_epochs", "2", "--skip_rate", "5",
        "--actions_to_consider", "walking", "--batch_size", "128",
    ])
    args.loss_type = "mpjpe"
    args.pose_dim = 66
    args.delta_x = False
    args.hidden_dim = 24
    args.num_blocks = 2
    args.save_path = str(tmp_path / "full")

    from motionmixerconv_tpu.cli._runner import build_conv_mixer

    seen = []
    model = build_conv_mixer(args, 66, 66, args.input_n, args.output_n)
    history, _, _ = run_h36m(
        args, model=model, model_name="cb",
        epoch_callback=lambda e, h: seen.append((e, len(h["test"]))),
    )
    assert seen == [(0, 1), (1, 2)]
    assert len(history["test"]) == 2

    # pruning: raise at epoch 0 -> run stops, artifacts of epoch 0 exist
    args2 = parse_args([
        "--data_dir", h36m_dir, "--n_epochs", "2", "--skip_rate", "5",
        "--actions_to_consider", "walking", "--batch_size", "128",
    ])
    args2.loss_type = "mpjpe"
    args2.pose_dim = 66
    args2.delta_x = False
    args2.hidden_dim = 24
    args2.num_blocks = 2
    args2.save_path = str(tmp_path / "pruned")

    def prune_now(epoch, history):
        raise TrialPruned()

    model2 = build_conv_mixer(args2, 66, 66, args2.input_n, args2.output_n)
    with pytest.raises(TrialPruned):
        run_h36m(args2, model=model2, model_name="cb",
                 epoch_callback=prune_now)
    _assert_artifacts(args2.save_path)
