"""Smoke for the result-gallery driver (visualization.ipynb equivalent)."""

import os

import pytest

from motionmixerconv_tpu.data import fixtures


def test_cli_rejects_no_action_and_half_pairs(tmp_path):
    """mmc-galleries must not silently succeed doing nothing: no action
    selected, or --checkpoint without --data_dir (and vice versa), exits
    non-zero with a usage error instead of printing nothing and rc 0."""
    from motionmixerconv_tpu.viz.galleries import main

    for argv in (
        ["--out", str(tmp_path)],
        ["--checkpoint", "x.ckpt", "--out", str(tmp_path)],
        ["--data_dir", "d", "--out", str(tmp_path)],
    ):
        with pytest.raises(SystemExit) as e:
            main(argv)
        assert e.value.code == 2


@pytest.mark.slow
def test_h36m_galleries_smoke(tmp_path):
    """Train 1 tiny epoch through the real CLI runner, then rebuild the
    notebook's tables + GIF galleries from the saved checkpoint."""
    from motionmixerconv_tpu.cli._runner import run_h36m
    from motionmixerconv_tpu.cli.train_mixer_h36m import parse_args
    from motionmixerconv_tpu.viz.galleries import h36m_galleries

    data_dir = str(tmp_path / "data")
    fixtures.make_h36m_corpus(data_dir, n_frames=400, seed=3)
    run_dir = str(tmp_path / "run")
    argv = [
        "--data_dir", data_dir, "--save_path", run_dir, "--loss_type", "mpjpe",
        "--n_epochs", "1", "--actions_to_consider", "walking",
        "--num_blocks", "1", "--hidden_dim", "16", "--skip_rate", "5",
    ]
    args = parse_args(argv)
    run_h36m(args)
    ckpts = []
    for root, _, files in os.walk(run_dir):
        ckpts += [os.path.join(root, f) for f in files if f == "model.ckpt"]
    assert ckpts, "runner did not save a checkpoint"

    out = str(tmp_path / "galleries")
    rows = h36m_galleries(
        ckpts[0], data_dir, out,
        args_override=parse_args([
            "--data_dir", data_dir, "--save_path", out, "--loss_type", "mpjpe",
            "--num_blocks", "1", "--hidden_dim", "16", "--skip_rate", "5",
        ]),
        actions=["walking", "eating"], max_gifs=1,
    )
    assert len(rows) == 2
    tables = open(os.path.join(out, "tables.md")).read()
    assert "walking" in tables and "average" in tables
    viz = os.path.join(out, "visualization")
    assert os.path.isdir(viz) and any(
        f.endswith(".gif") for f in os.listdir(viz))


def test_study_tables_smoke(tmp_path):
    """study.md from a minimal sweep directory."""
    from motionmixerconv_tpu.sweep.engine import Study
    from motionmixerconv_tpu.viz.galleries import study_tables

    sdir = str(tmp_path / "study")
    os.makedirs(sdir)

    def objective(trial):
        x = trial.suggest_int("kernel1_x_Time", 1, 3)
        y = trial.suggest_int("kernel1_y_Pose", 1, 3)
        trial.set_user_attr("walking_mpjpe", float(x + y))
        return float((x - 2) ** 2 + (y - 1) ** 2)

    study = Study(os.path.basename(sdir),
                  storage=f"sqlite:///{sdir}/results.db")
    study.optimize(objective, n_trials=9)
    path = study_tables(sdir, str(tmp_path / "out"))
    text = open(path).read()
    assert "Kernel grid" in text and "Best trials" in text
