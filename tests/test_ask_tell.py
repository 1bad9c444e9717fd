"""optuna Study-API completion: ask/tell, enqueue_trial, best_trials
(Pareto front), study-level user attrs.

These round out the surface users port optuna orchestration code against
(the reference only calls optimize()/best_params, conv_optuna_main.py:
400-408; everything here is capability the reference gets from optuna
itself)."""

import pytest

from motionmixerconv_tpu.sweep import (
    GridSampler,
    RandomSampler,
    Study,
    TPESampler,
)


class TestAskTell:
    def test_ask_tell_complete(self):
        study = Study("a", sampler=RandomSampler(seed=0))
        for _ in range(4):
            trial = study.ask()
            x = trial.suggest_float("x", 0.0, 1.0)
            study.tell(trial, x * 2)
        assert len(study.trials) == 4
        assert [t.number for t in study.trials] == [0, 1, 2, 3]
        for t in study.trials:
            assert t.values == [t.params["x"] * 2]

    def test_tell_states(self):
        study = Study("b", sampler=RandomSampler(seed=0))
        t1, t2, t3 = study.ask(), study.ask(), study.ask()
        study.tell(t1, 1.0)
        study.tell(t2, state="PRUNED")
        study.tell(t3, state="FAIL")
        assert [t.state for t in study.trials] == [
            "COMPLETE", "PRUNED", "FAIL"]
        with pytest.raises(ValueError, match="unknown trial state"):
            study.tell(study.ask(), state="WAITING")
        with pytest.raises(ValueError, match="needs values"):
            study.tell(study.ask())

    def test_ask_tell_feeds_tpe(self):
        study = Study("c", sampler=TPESampler(seed=0, n_startup=3))
        for _ in range(6):
            trial = study.ask()
            x = trial.suggest_float("x", -1.0, 1.0)
            study.tell(trial, x * x)
        assert len(study.sampler._history) == 6

    def test_ask_interleaves_with_optimize(self):
        study = Study("d", sampler=RandomSampler(seed=0))
        manual = study.ask()
        manual.suggest_int("n", 0, 9)
        study.optimize(lambda t: float(t.suggest_int("n", 0, 9)), n_trials=3)
        study.tell(manual, 0.5)
        numbers = sorted(t.number for t in study.trials)
        assert numbers == [0, 1, 2, 3]  # no collisions


class TestResumeNumbering:
    def test_resume_skips_gapped_numbers(self, tmp_path):
        """Numbers resume from max+1, not len: an ask() never told (or a
        killed n_jobs run) leaves gaps that must not be reissued."""
        db = f"sqlite:///{tmp_path}/g.db"
        s1 = Study("g", storage=db, sampler=RandomSampler(seed=0))
        t0, _t1, t2 = s1.ask(), s1.ask(), s1.ask()
        for t in (t0, t2):
            t.suggest_int("n", 0, 9)
            s1.tell(t, 1.0)  # number 1 never told -> gap in sqlite
        s2 = Study("g", storage=db, sampler=RandomSampler(seed=0))
        assert {t.number for t in s2.trials} == {0, 2}
        assert s2.ask().number == 3  # not 2


class TestWorkerErrorStopsIssuing:
    def test_other_workers_stop_after_uncaught_error(self):
        import threading
        import time

        study = Study("w", sampler=RandomSampler(seed=0))
        calls = [0]
        lock = threading.Lock()

        def objective(trial):
            with lock:
                calls[0] += 1
                first = trial.number == 0
            if first:
                raise ValueError("boom")
            time.sleep(0.1)
            trial.suggest_int("n", 0, 9)
            return 0.0

        with pytest.raises(ValueError, match="boom"):
            study.optimize(objective, n_trials=50, n_jobs=3)
        # in-flight trials may finish; nobody starts the remaining ~45
        assert calls[0] <= 6, calls[0]


class TestEnqueue:
    def test_enqueued_params_win(self):
        study = Study("e", sampler=RandomSampler(seed=0))
        study.enqueue_trial({"n": 7})
        seen = []
        study.optimize(
            lambda t: seen.append(t.suggest_int("n", 0, 9)) or 0.0,
            n_trials=3)
        assert seen[0] == 7  # first trial pinned; rest sampled
        assert study.trials[0].params["n"] == 7

    def test_enqueue_partial_params(self):
        study = Study("f", sampler=RandomSampler(seed=3))

        def objective(trial):
            a = trial.suggest_int("a", 0, 9)
            b = trial.suggest_int("b", 0, 9)
            return float(a + b)

        study.enqueue_trial({"a": 5})
        study.optimize(objective, n_trials=1)
        assert study.trials[0].params["a"] == 5
        assert 0 <= study.trials[0].params["b"] <= 9

    def test_enqueue_registers_grid_space(self):
        study = Study("g", sampler=GridSampler())
        study.enqueue_trial({"a": 1})

        def objective(trial):
            a = trial.suggest_int("a", 0, 2)
            b = trial.suggest_categorical("b", ["x", "y"])
            return float(a)

        study.optimize(objective, n_trials=20)
        # the enqueued trial still taught the grid both spaces; the full
        # 3x2 grid is enumerated afterwards (numbers shifted by the queue)
        assert study.sampler.n_points() == 6
        assert len(study.trials) >= 6


class TestBestTrials:
    def test_single_objective_ties(self):
        study = Study("h", sampler=RandomSampler(seed=0))
        t1, t2, t3 = study.ask(), study.ask(), study.ask()
        for t, v in ((t1, 1.0), (t2, 1.0), (t3, 2.0)):
            t.suggest_int("n", 0, 9)
            study.tell(t, v)
        best = study.best_trials
        assert {t.number for t in best} == {0, 1}

    def test_pareto_front_two_objectives(self):
        study = Study("i", directions=["minimize", "minimize"],
                      sampler=RandomSampler(seed=0))
        pts = [(1.0, 4.0), (2.0, 2.0), (4.0, 1.0), (3.0, 3.0), (2.0, 5.0)]
        for v in pts:
            t = study.ask()
            t.suggest_int("n", 0, 9)
            study.tell(t, list(v))
        front = {tuple(t.values) for t in study.best_trials}
        assert front == {(1.0, 4.0), (2.0, 2.0), (4.0, 1.0)}

    def test_pareto_respects_directions(self):
        study = Study("j", directions=["minimize", "maximize"],
                      sampler=RandomSampler(seed=0))
        for v in [(1.0, 9.0), (1.0, 1.0), (2.0, 10.0)]:
            t = study.ask()
            t.suggest_int("n", 0, 9)
            study.tell(t, list(v))
        front = {tuple(t.values) for t in study.best_trials}
        assert front == {(1.0, 9.0), (2.0, 10.0)}


class TestStudyAttrs:
    def test_attrs_persist_across_resume(self, tmp_path):
        db = f"sqlite:///{tmp_path}/s.db"
        s1 = Study("k", storage=db, sampler=RandomSampler(seed=0))
        s1.set_user_attr("dataset", "h36m")
        s1.set_user_attr("cutoff", 3)
        s1.set_user_attr("cutoff", 4)  # overwrite, not duplicate
        s2 = Study("k", storage=db, sampler=RandomSampler(seed=0))
        assert s2.user_attrs == {"dataset": "h36m", "cutoff": 4}

    def test_attrs_without_storage(self):
        s = Study("l", sampler=RandomSampler(seed=0))
        s.set_user_attr("note", [1, 2])
        assert s.user_attrs == {"note": [1, 2]}

    def test_attrs_export_to_optuna_schema(self, tmp_path):
        import json
        import sqlite3

        from motionmixerconv_tpu.sweep import export_optuna_sqlite

        s = Study("m", storage=f"sqlite:///{tmp_path}/n.db",
                  sampler=RandomSampler(seed=0))
        s.set_user_attr("dataset", "h36m")
        t = s.ask()
        t.suggest_int("n", 0, 3)
        s.tell(t, 1.0)
        # both export paths: live study and stored native db
        for src in (s, f"{tmp_path}/n.db"):
            dst = str(tmp_path / f"o_{src is s}.db")
            export_optuna_sqlite(src, dst)
            rows = sqlite3.connect(dst).execute(
                "SELECT key, value_json FROM study_user_attributes"
            ).fetchall()
            assert rows == [("dataset", json.dumps("h36m"))]
