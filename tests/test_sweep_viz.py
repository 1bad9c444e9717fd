"""Tests for the sweep engine, GIF visualization, and pretrained-eval CLI."""

import os

import numpy as np
import pytest

from motionmixerconv_tpu.sweep import GridSampler, RandomSampler, Study, Trial


class TestSweepEngine:
    def test_grid_enumerates_cartesian_product(self, tmp_path):
        seen = []

        def objective(trial):
            a = trial.suggest_int("a", 1, 3, step=1)
            b = trial.suggest_categorical("b", ["x", "y"])
            seen.append((a, b))
            return float(a)

        study = Study("t", sampler=GridSampler())
        study.optimize(objective, n_trials=20)
        assert len(seen) == 6  # grid exhausted, not 20
        assert sorted(set(seen)) == [(i, c) for i in (1, 2, 3) for c in ("x", "y")]

    def test_sqlite_persistence_and_resume(self, tmp_path):
        db = f"sqlite:///{tmp_path}/results.db"

        def objective(trial):
            v = trial.suggest_int("v", 1, 4, step=1)
            trial.set_user_attr("doubled", v * 2)
            return float(v)

        s1 = Study("persist", storage=db, sampler=GridSampler())
        s1.optimize(objective, n_trials=2)
        s2 = Study("persist", storage=db, sampler=GridSampler())
        assert len(s2.trials) == 2
        s2.optimize(objective, n_trials=10)
        assert len(s2.trials) == 4  # resumed and exhausted the 4-point grid
        assert s2.best_trial.values[0] == 1.0
        assert s2.best_trial.user_attrs["doubled"] == 2

    def test_catch_records_failures(self):
        def objective(trial):
            v = trial.suggest_int("v", 1, 3, step=1)
            if v == 2:
                raise RuntimeError("boom")
            return float(v)

        study = Study("f", sampler=GridSampler())
        study.optimize(objective, n_trials=10, catch=(Exception,))
        states = [t.state for t in study.trials]
        assert states.count("FAIL") == 1 and states.count("COMPLETE") == 2

    def test_random_sampler(self):
        study = Study("r", sampler=RandomSampler(seed=1))
        study.optimize(lambda t: float(t.suggest_int("v", 1, 100)), n_trials=5)
        assert len(study.trials) == 5

    def test_multi_objective(self):
        def objective(trial):
            v = trial.suggest_int("v", 1, 2, step=1)
            return float(v), float(-v)

        study = Study("m", sampler=GridSampler(), directions=["minimize", "minimize"])
        study.optimize(objective, n_trials=5)
        assert all(len(t.values) == 2 for t in study.trials)

    def test_trials_dataframe(self):
        study = Study("df", sampler=GridSampler())
        study.optimize(lambda t: float(t.suggest_int("v", 1, 2, step=1)), n_trials=5)
        df = study.trials_dataframe()
        assert "params_v" in df.columns and len(df) == 2


class TestViz:
    def test_h36m_gif(self, tmp_path):
        from motionmixerconv_tpu.viz import visualize_batch

        rs = np.random.RandomState(0)
        pred = rs.randn(3, 96).astype(np.float32) * 100
        gt = pred + rs.randn(3, 96).astype(np.float32) * 10
        inp = rs.randn(2, 96).astype(np.float32) * 100
        path = str(tmp_path / "out.gif")
        visualize_batch(pred, path, batch_gt=gt, batch_train=inp)
        assert os.path.getsize(path) > 1000
        with open(path, "rb") as f:
            assert f.read(6) in (b"GIF87a", b"GIF89a")

    def test_ais_gif(self, tmp_path):
        from motionmixerconv_tpu.viz import visualize_batch_ais

        rs = np.random.RandomState(0)
        pred = rs.randn(3, 57).astype(np.float32)
        path = str(tmp_path / "ais.gif")
        visualize_batch_ais(pred, path, batch_gt=pred, batch_train=pred[:1])
        assert os.path.getsize(path) > 1000


class TestPretrainedEval:
    def test_eval_from_torch_pt(self, tmp_path):
        """test_mixer_h36m loads a torch state_dict and evaluates."""
        import torch

        from motionmixerconv_tpu.data import fixtures
        from motionmixerconv_tpu.cli import test_mixer_h36m as tm

        fixtures.make_h36m_corpus(
            str(tmp_path / "data"), actions=["walking"], n_frames=400, seed=3
        )
        # build a torch state_dict from the golden MlpMixer fixture config
        golden = np.load(
            os.path.join(os.path.dirname(__file__), "golden", "model_mlp_mixer.npz")
        )
        sd = {k[4:]: torch.from_numpy(golden[k]) for k in golden.files
              if k.startswith("sd::")}
        pt_path = str(tmp_path / "model.pt")
        torch.save(sd, pt_path)

        args = tm.parse_args([
            "--data_dir", str(tmp_path / "data"),
            "--model_path", pt_path,
            "--input_n", "10", "--output_n", "25", "--skip_rate", "5",
            "--actions_to_consider", "walking",
            "--num_blocks", "2", "--hidden_dim", "50",
            "--tokens_mlp_dim", "20", "--channels_mlp_dim", "50",
            "--activation", "mish", "--regularization", "0.1", "--r_se", "8",
            "--delta_x", "True",
        ])
        from motionmixerconv_tpu.cli._runner import build_mlp_mixer

        model = build_mlp_mixer(args, args.pose_dim, args.input_n, args.output_n)
        variables = tm.load_model_variables(model, pt_path, args.num_blocks)
        avg, final = tm.test_pretrained(model, variables, args)
        assert np.isfinite(avg) and np.isfinite(final)

    def test_eval_from_native_ckpt(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from motionmixerconv_tpu.cli import test_mixer_h36m as tm
        from motionmixerconv_tpu.cli._runner import build_mlp_mixer
        from motionmixerconv_tpu.data import fixtures
        from motionmixerconv_tpu.train import make_optimizer, save_checkpoint
        from motionmixerconv_tpu.train.loop import Trainer
        from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ

        fixtures.make_h36m_corpus(
            str(tmp_path / "data"), actions=["walking"], n_frames=400, seed=3
        )
        args = tm.parse_args([
            "--data_dir", str(tmp_path / "data"),
            "--model_path", str(tmp_path / "model.ckpt"),
            "--input_n", "10", "--output_n", "25", "--skip_rate", "5",
            "--actions_to_consider", "walking",
            "--num_blocks", "1", "--hidden_dim", "24",
        ])
        model = build_mlp_mixer(args, 66, 10, 25)
        trainer = Trainer(
            model, make_optimizer(lr=1e-3, steps_per_epoch=1),
            loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
            input_n=10, output_n=25, input_scale=1e-3,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        save_checkpoint(str(tmp_path / "model.ckpt"), state, epoch=0)
        variables = tm.load_model_variables(
            model, str(tmp_path / "model.ckpt"), args.num_blocks
        )
        avg, final = tm.test_pretrained(model, variables, args)
        assert np.isfinite(avg) and np.isfinite(final)

    def test_eval_meta_threads_embed_dtype(self):
        """embed_dtype is an eval-semantics key: a checkpoint trained with
        --embed_dtype bf16 must rebuild with the bf16 embed storage, or the
        reported metric measures a different numeric path than the model
        serving deploys for the same checkpoint."""
        import jax.numpy as jnp

        from motionmixerconv_tpu.cli import test_mixer_h36m as tm
        from motionmixerconv_tpu.cli._runner import build_conv_mixer

        assert "embed_dtype" in tm.ARCH_META_KEYS
        args = tm.parse_args(
            ["--model_path", "x.ckpt"],
            meta={"embed_dtype": "bf16", "model_type": "conv"})
        model = build_conv_mixer(args, 66, 66, 10, 25)
        assert model.encoder_embed_dtype == jnp.bfloat16

    def test_eval_autofills_arch_from_ckpt_meta(self, tmp_path):
        """A bare --model_path evaluates a non-default trained config: the
        architecture resolves from the checkpoint's stored training args
        (save_checkpoint meta), and an explicit flag still wins."""
        import jax

        from motionmixerconv_tpu.cli import test_mixer_h36m as tm
        from motionmixerconv_tpu.cli._runner import build_conv_mixer
        from motionmixerconv_tpu.cli.train_mixer_h36m import (
            parse_args as train_parse,
        )
        from motionmixerconv_tpu.data import fixtures
        from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
        from motionmixerconv_tpu.train import make_optimizer, save_checkpoint
        from motionmixerconv_tpu.train.loop import Trainer

        fixtures.make_h36m_corpus(
            str(tmp_path / "data"), actions=["walking"], n_frames=400, seed=3
        )
        # non-default conv config: CLI defaults (num_blocks 4 / hidden 50 /
        # output_n 25 / mlp eval model) would all mismatch this checkpoint
        targs = train_parse([
            "--data_dir", str(tmp_path / "data"), "--save_path", str(tmp_path),
            "--loss_type", "mpjpe", "--output_n", "10", "--skip_rate", "5",
            "--num_blocks", "2", "--hidden_dim", "30",
        ])
        model = build_conv_mixer(targs, 66, 66, 10, 10)
        trainer = Trainer(
            model, make_optimizer(lr=1e-3, steps_per_epoch=1),
            loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
            input_n=10, output_n=10, input_scale=1e-3,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        ckpt = str(tmp_path / "model.ckpt")
        save_checkpoint(ckpt, state, epoch=0, meta=vars(targs))

        avg, final = tm.main([
            "--data_dir", str(tmp_path / "data"), "--model_path", ckpt,
            "--actions_to_consider", "walking",
        ])
        assert np.isfinite(avg) and np.isfinite(final)

        # explicit flag beats meta: a wrong --num_blocks must fail to load
        with pytest.raises(Exception):
            tm.main([
                "--data_dir", str(tmp_path / "data"), "--model_path", ckpt,
                "--actions_to_consider", "walking", "--num_blocks", "3",
            ])


def test_grid_resume_covers_full_grid(tmp_path):
    """Resumed grid studies must decode against the FULL persisted space —
    no duplicated points, no holes (regression: the space used to be
    re-discovered lazily so resume re-ran old points and skipped others)."""
    db = f"sqlite:///{tmp_path}/results.db"

    def objective(trial):
        a = trial.suggest_int("a", 1, 2, step=1)
        b = trial.suggest_int("b", 10, 40, step=10)
        return float(a * 100 + b)

    s1 = Study("g", storage=db, sampler=GridSampler())
    s1.optimize(objective, n_trials=4)

    s2 = Study("g", storage=db, sampler=GridSampler())  # fresh process
    s2.optimize(objective, n_trials=10)

    done = [t for t in s2.trials if t.state == "COMPLETE"]
    points = sorted((t.params["a"], t.params["b"]) for t in done)
    assert len(done) == 8, f"grid has 8 points, ran {len(done)}"
    assert points == sorted(
        (a, b) for a in (1, 2) for b in (10, 20, 30, 40)
    ), f"duplicates/holes in resumed grid: {points}"


def test_tpe_beats_random_on_quadratic(tmp_path):
    """TPE should concentrate samples near the optimum of a smooth objective
    and find a better best-value than random search under the same budget."""
    from motionmixerconv_tpu.sweep import TPESampler

    def objective(trial):
        x = trial.suggest_int("x", 0, 100)
        y = trial.suggest_int("y", 0, 100)
        return float((x - 70) ** 2 + (y - 30) ** 2)

    tpe = Study("tpe", sampler=TPESampler(seed=0, n_startup=10))
    tpe.optimize(objective, n_trials=60)
    rnd = Study("rnd", sampler=RandomSampler(seed=0))
    rnd.optimize(objective, n_trials=60)

    best_tpe = tpe.best_trial.values[0]
    best_rnd = rnd.best_trial.values[0]
    assert best_tpe <= best_rnd, (best_tpe, best_rnd)
    assert best_tpe < 200.0  # near the optimum


def test_tpe_resume_replays_history(tmp_path):
    from motionmixerconv_tpu.sweep import TPESampler

    db = f"sqlite:///{tmp_path}/r.db"

    def objective(trial):
        return float(trial.suggest_int("x", 0, 50))

    s1 = Study("t", storage=db, sampler=TPESampler(seed=1, n_startup=5))
    s1.optimize(objective, n_trials=8)
    s2 = Study("t", storage=db, sampler=TPESampler(seed=2, n_startup=5))
    assert len(s2.sampler._history) == 8  # replayed, so TPE is warm on resume
    s2.optimize(objective, n_trials=4)
    assert len(s2.trials) == 12


def test_tpe_categorical():
    from motionmixerconv_tpu.sweep import TPESampler

    def objective(trial):
        c = trial.suggest_categorical("reg", [-1, 0, 0.1])
        return 0.0 if c == 0.1 else 1.0

    s = Study("c", sampler=TPESampler(seed=0, n_startup=6))
    s.optimize(objective, n_trials=30)
    late = [t.params["reg"] for t in s.trials[-10:]]
    assert late.count(0.1) >= 7  # exploitation after startup


def test_tpe_multi_objective_observes_all_objectives():
    """Two-objective TPE (the h36m conv study shape): the second objective
    must influence the good/bad split — it used to be silently dropped."""
    import warnings

    from motionmixerconv_tpu.sweep import TPESampler

    def objective(trial):
        x = trial.suggest_int("x", 0, 100)
        # objective 1 is constant: only objective 2 can guide the search
        return 1.0, float((x - 25) ** 2)

    s = Study(
        "mo", sampler=TPESampler(seed=0, n_startup=10),
        directions=["minimize", "minimize"],
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        s.optimize(objective, n_trials=60)
    assert any("multi-objective" in str(w.message) for w in caught)
    # every observation keeps both objectives
    assert all(len(v) == 2 for _, v in s.sampler._history)
    # the search exploits objective 2 (would be random if values[1] were dropped)
    late = [t.params["x"] for t in s.trials[-15:]]
    assert sum(abs(x - 25) <= 15 for x in late) >= 10, late


def test_tpe_respects_maximize_direction():
    """observe() direction-adjusts values, so a maximize study exploits high
    values (previously direction was ignored by the sampler)."""
    from motionmixerconv_tpu.sweep import TPESampler

    def objective(trial):
        x = trial.suggest_int("x", 0, 100)
        return -float((x - 80) ** 2)

    s = Study("mx", sampler=TPESampler(seed=0, n_startup=10),
              directions=["maximize"])
    s.optimize(objective, n_trials=60)
    late = [t.params["x"] for t in s.trials[-15:]]
    assert sum(abs(x - 80) <= 15 for x in late) >= 10, late
