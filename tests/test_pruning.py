"""Pruning surface: trial.report / trial.should_prune / MedianPruner.

optuna's early-stopping idiom (report an intermediate value each epoch,
raise TrialPruned when should_prune() says so) is part of the API users
port objectives against. The reference studies don't prune (they run
fixed-epoch trials), so this pins the native engine's semantics against
optuna's documented MedianPruner behavior: no pruning before
n_startup_trials COMPLETE trials, warmup steps exempt, prune when the
trial's running-best intermediate up to step s is worse than the median of
completed trials' values AT exactly step s (optuna's asymmetry: running
best for the current trial only — see engine.MedianPruner and
test_peers_judged_at_exact_step). Intermediate
values persist to sqlite and export into optuna's
trial_intermediate_values (schema-12) table.
"""

import sqlite3

import pytest

from motionmixerconv_tpu.sweep import (
    MedianPruner,
    RandomSampler,
    Study,
    TrialPruned,
)
from motionmixerconv_tpu.sweep.engine import GridSampler


def _objective(curve):
    """Objective that reports curve[step] for 5 steps then returns the last."""

    def objective(trial):
        trial.suggest_int("slot", 0, 99)  # placement only
        for step, v in enumerate(curve):
            trial.report(v, step)
            if trial.should_prune():
                raise TrialPruned()
        return curve[-1]

    return objective


class TestMedianPruner:
    def test_bad_trial_pruned_after_startup(self):
        study = Study("p", sampler=RandomSampler(seed=0),
                      pruner=MedianPruner(n_startup_trials=2))
        good = [1.0, 0.8, 0.6, 0.4, 0.2]
        bad = [5.0, 5.0, 5.0, 5.0, 5.0]
        for curve in (good, good):  # startup: completes regardless
            study.optimize(_objective(curve), n_trials=1)
        study.optimize(_objective(bad), n_trials=1)
        states = [t.state for t in study.trials]
        assert states == ["COMPLETE", "COMPLETE", "PRUNED"]
        # pruned at the first checked step (>= startup satisfied, step 0)
        assert list(study.trials[2].intermediate_values) == [0]

    def test_no_pruning_before_startup(self):
        study = Study("p2", sampler=RandomSampler(seed=0),
                      pruner=MedianPruner(n_startup_trials=5))
        study.optimize(_objective([9.0] * 5), n_trials=3)
        assert all(t.state == "COMPLETE" for t in study.trials)

    def test_warmup_steps_exempt(self):
        study = Study("p3", sampler=RandomSampler(seed=0),
                      pruner=MedianPruner(n_startup_trials=1,
                                          n_warmup_steps=3))
        study.optimize(_objective([1.0, 1.0, 1.0, 1.0, 0.5]), n_trials=1)
        study.optimize(_objective([9.0, 9.0, 9.0, 9.0, 9.0]), n_trials=1)
        bad = study.trials[1]
        assert bad.state == "PRUNED"
        # survived steps 0-2 (warmup), pruned at step 3
        assert sorted(bad.intermediate_values) == [0, 1, 2, 3]

    def test_maximize_direction(self):
        study = Study("p4", sampler=RandomSampler(seed=0),
                      directions=["maximize"],
                      pruner=MedianPruner(n_startup_trials=1))
        study.optimize(_objective([0.9, 0.9, 0.9, 0.9, 0.9]), n_trials=1)
        study.optimize(_objective([0.1, 0.1, 0.1, 0.1, 0.1]), n_trials=1)
        assert [t.state for t in study.trials] == ["COMPLETE", "PRUNED"]

    def test_median_is_over_same_step(self):
        """A trial beating the median at its reported step survives."""
        study = Study("p5", sampler=RandomSampler(seed=0),
                      pruner=MedianPruner(n_startup_trials=1))
        study.optimize(_objective([2.0, 2.0, 2.0, 2.0, 2.0]), n_trials=1)
        study.optimize(_objective([1.0, 1.0, 1.0, 1.0, 1.0]), n_trials=1)
        assert all(t.state == "COMPLETE" for t in study.trials)

    def test_running_best_keeps_nonmonotone_trial(self):
        """A spiky curve whose BEST point beats the median survives even
        when its LATEST report is worse — latest-value pruning would kill
        it at step 2 (ADVICE r3: optuna compares running bests)."""
        study = Study("p7", sampler=RandomSampler(seed=0),
                      pruner=MedianPruner(n_startup_trials=1))
        study.optimize(_objective([2.0, 2.0, 2.0, 2.0, 2.0]), n_trials=1)
        study.optimize(_objective([2.0, 1.0, 3.0, 3.0, 3.0]), n_trials=1)
        assert [t.state for t in study.trials] == ["COMPLETE", "COMPLETE"]

    def test_peers_judged_at_exact_step(self):
        """optuna's asymmetry (PercentilePruner): peers contribute their
        value AT step s, not their running best — a peer that dipped to 1.0
        early but regressed to 3.0 sets the step-1 bar at 3.0, so a steady
        2.0 trial survives (running-best peers would kill it)."""
        study = Study("p8", sampler=RandomSampler(seed=0),
                      pruner=MedianPruner(n_startup_trials=1,
                                          n_warmup_steps=1))
        study.optimize(_objective([1.0, 3.0, 3.0, 3.0, 3.0]), n_trials=1)
        study.optimize(_objective([2.0, 2.0, 2.0, 2.0, 2.0]), n_trials=1)
        assert study.trials[1].state == "COMPLETE"

    def test_peers_without_report_at_step_are_excluded(self):
        """A step where no completed peer reported cannot prune."""
        study = Study("p9", sampler=RandomSampler(seed=0),
                      pruner=MedianPruner(n_startup_trials=1))
        study.optimize(_objective([1.0, 1.0]), n_trials=1)
        # steps 2-4 have no peer reports; steps 0-1 compare 9.0 > 1.0 only
        # after the trial has already been pruned at step 0
        study.optimize(_objective([0.5, 0.5, 9.0, 9.0, 9.0]), n_trials=1)
        assert study.trials[1].state == "COMPLETE"

    def test_no_pruner_never_prunes(self):
        study = Study("p6", sampler=RandomSampler(seed=0))
        study.optimize(_objective([9.0] * 5), n_trials=2)
        assert all(t.state == "COMPLETE" for t in study.trials)


class TestPersistence:
    def test_intermediates_roundtrip_sqlite(self, tmp_path):
        db = f"sqlite:///{tmp_path}/s.db"
        study = Study("rt", storage=db, sampler=RandomSampler(seed=0))
        study.optimize(_objective([3.0, 2.0, 1.0, 0.5, 0.25]), n_trials=2)
        resumed = Study("rt", storage=db, sampler=RandomSampler(seed=0))
        assert len(resumed.trials) == 2
        for t in resumed.trials:
            assert t.intermediate_values == {
                0: 3.0, 1: 2.0, 2: 1.0, 3: 0.5, 4: 0.25}

    def test_resume_feeds_pruner_history(self, tmp_path):
        """A resumed study prunes against trials recorded before restart."""
        db = f"sqlite:///{tmp_path}/s2.db"
        s1 = Study("r2", storage=db, sampler=RandomSampler(seed=0),
                   pruner=MedianPruner(n_startup_trials=1))
        s1.optimize(_objective([1.0] * 5), n_trials=1)
        s2 = Study("r2", storage=db, sampler=RandomSampler(seed=1),
                   pruner=MedianPruner(n_startup_trials=1))
        s2.optimize(_objective([9.0] * 5), n_trials=1)
        assert [t.state for t in s2.trials] == ["COMPLETE", "PRUNED"]

    def test_export_writes_intermediate_values(self, tmp_path):
        from motionmixerconv_tpu.sweep import export_optuna_sqlite

        study = Study("ex", sampler=RandomSampler(seed=0))
        study.optimize(_objective([2.0, 1.5, 1.0, 0.75, 0.5]), n_trials=1)
        dst = str(tmp_path / "optuna.db")
        export_optuna_sqlite(study, dst)
        rows = sqlite3.connect(dst).execute(
            "SELECT step, intermediate_value, intermediate_value_type "
            "FROM trial_intermediate_values ORDER BY step").fetchall()
        assert rows == [(0, 2.0, "FINITE"), (1, 1.5, "FINITE"),
                        (2, 1.0, "FINITE"), (3, 0.75, "FINITE"),
                        (4, 0.5, "FINITE")]

    def test_export_native_db_roundtrip(self, tmp_path):
        """Exporting from the stored native db (not the live study) carries
        the intermediates too."""
        from motionmixerconv_tpu.sweep import export_optuna_sqlite

        native = str(tmp_path / "native.db")
        study = Study("exdb", storage=f"sqlite:///{native}",
                      sampler=RandomSampler(seed=0))
        study.optimize(_objective([4.0, 3.0, 2.0, 1.0, 0.5]), n_trials=1)
        dst = str(tmp_path / "optuna2.db")
        export_optuna_sqlite(native, dst)
        n = sqlite3.connect(dst).execute(
            "SELECT COUNT(*) FROM trial_intermediate_values").fetchone()[0]
        assert n == 5


class TestNaN:
    def test_nan_report_always_prunes(self):
        """A diverged trial (NaN report) is prunable immediately — before
        startup trials and inside warmup (a NaN never recovers)."""
        study = Study("nan1", sampler=RandomSampler(seed=0),
                      pruner=MedianPruner(n_startup_trials=50,
                                          n_warmup_steps=10))
        study.optimize(_objective([1.0, float("nan"), 1.0, 1.0, 1.0]),
                       n_trials=1)
        t = study.trials[0]
        assert t.state == "PRUNED"
        assert sorted(t.intermediate_values) == [0, 1]

    def test_nan_peer_does_not_poison_median(self):
        """A COMPLETE trial with NaN intermediates is excluded from the
        median, so pruning keeps working for later trials."""
        study = Study("nan2", sampler=RandomSampler(seed=0),
                      pruner=MedianPruner(n_startup_trials=1))
        # completes with a NaN at step 0 (no pruner would fire: startup)
        nan_curve = [float("nan")] * 5

        def no_prune_objective(trial):
            trial.suggest_int("slot", 0, 99)
            for step, v in enumerate(nan_curve):
                trial.report(v, step)
            return 1.0  # returns a finite objective

        study.optimize(no_prune_objective, n_trials=1)
        study.optimize(_objective([1.0] * 5), n_trials=1)
        study.optimize(_objective([9.0] * 5), n_trials=1)
        # the 9.0 trial is pruned against median(1.0), not median(nan, 1.0)
        assert [t.state for t in study.trials] == [
            "COMPLETE", "COMPLETE", "PRUNED"]


class TestAnalysis:
    def test_learning_curves_dataframe(self, tmp_path):
        import numpy as np

        from motionmixerconv_tpu.sweep.analysis import learning_curves

        study_dir = tmp_path / "s"
        study_dir.mkdir()
        study = Study("s", storage=f"sqlite:///{study_dir}/results.db",
                      sampler=RandomSampler(seed=0),
                      pruner=MedianPruner(n_startup_trials=1))
        study.optimize(_objective([1.0, 0.8, 0.6, 0.4, 0.2]), n_trials=1)
        study.optimize(_objective([9.0] * 5), n_trials=1)  # pruned at step 0
        df = learning_curves(str(study_dir))
        assert list(df.columns) == [0, 1]
        assert list(df.index) == [0, 1, 2, 3, 4]
        assert df[0].tolist() == [1.0, 0.8, 0.6, 0.4, 0.2]
        assert df[1][0] == 9.0 and np.isnan(df[1][1:]).all()

    def test_learning_curves_empty_raises(self, tmp_path):
        from motionmixerconv_tpu.sweep.analysis import learning_curves

        study_dir = tmp_path / "s2"
        study_dir.mkdir()
        study = Study("s2", storage=f"sqlite:///{study_dir}/results.db",
                      sampler=RandomSampler(seed=0))
        study.optimize(lambda t: (t.suggest_int("n", 0, 3), 1.0)[1],
                       n_trials=1)
        with pytest.raises(ValueError, match="no reported"):
            learning_curves(str(study_dir))


class TestConcurrent:
    def test_pruning_under_n_jobs(self):
        pruner = MedianPruner(n_startup_trials=2)
        study = Study("c", sampler=GridSampler(), pruner=pruner)

        def objective(trial):
            n = trial.suggest_int("n", 0, 7)
            v = 1.0 if n < 4 else 9.0
            for step in range(3):
                trial.report(v, step)
                if trial.should_prune():
                    raise TrialPruned()
            return v

        study.optimize(objective, n_trials=8, n_jobs=4)
        assert len(study.trials) == 8
        assert {t.state for t in study.trials} <= {"COMPLETE", "PRUNED"}
        # every good trial completed; pruning never produced FAIL/lost trials
        good = [t for t in study.trials if t.params["n"] < 4]
        assert all(t.state == "COMPLETE" for t in good)
