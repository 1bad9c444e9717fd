"""Study.optimize(n_jobs>1) — optuna's thread-pool trial execution.

optuna's Study.optimize accepts n_jobs (reference studies run with the
default 1, but the surface is part of the API users port against). These
tests pin the native engine's semantics: every grid point is visited
exactly once, sqlite recording is thread-safe, `catch` works from worker
threads, and TPE observation stays consistent under concurrency.
"""

import sqlite3
import threading

import pytest

from motionmixerconv_tpu.sweep import (
    GridSampler,
    RandomSampler,
    Study,
    TPESampler,
)


def _grid_objective(trial):
    a = trial.suggest_int("a", 0, 2)
    b = trial.suggest_categorical("b", ["x", "y"])
    return a + (0.5 if b == "y" else 0.0)


class TestNJobsGrid:
    def test_grid_covered_exactly_once(self):
        study = Study("g", sampler=GridSampler())
        seen = []
        lock = threading.Lock()

        def objective(trial):
            v = _grid_objective(trial)
            with lock:
                seen.append((trial.params["a"], trial.params["b"]))
            return v

        study.optimize(objective, n_trials=20, n_jobs=3)
        # 3x2 grid: exactly 6 trials, each point exactly once
        assert sorted(seen) == sorted(
            (a, b) for a in (0, 1, 2) for b in ("x", "y"))
        assert len(study.trials) == 6
        assert all(t.state == "COMPLETE" for t in study.trials)

    def test_matches_sequential_results(self):
        seq = Study("s", sampler=GridSampler())
        seq.optimize(_grid_objective, n_trials=20)
        par = Study("p", sampler=GridSampler())
        par.optimize(_grid_objective, n_trials=20, n_jobs=4)
        # same set of (params, value); trial numbering may interleave
        key = lambda t: (t.params["a"], t.params["b"], tuple(t.values))
        assert sorted(map(key, seq.trials)) == sorted(map(key, par.trials))

    def test_best_trial(self):
        study = Study("b", sampler=GridSampler(), directions=["maximize"])
        study.optimize(_grid_objective, n_trials=20, n_jobs=2)
        assert study.best_trial.values == [2.5]


class TestNJobsStorageAndErrors:
    def test_sqlite_records_from_worker_threads(self, tmp_path):
        db = tmp_path / "study.db"
        study = Study("db", storage=f"sqlite:///{db}",
                      sampler=GridSampler())
        study.optimize(_grid_objective, n_trials=20, n_jobs=3)
        rows = sqlite3.connect(db).execute(
            "SELECT COUNT(*) FROM trials WHERE study='db'").fetchone()
        assert rows[0] == 6

    def test_catch_in_worker(self):
        study = Study("c", sampler=RandomSampler(seed=0))

        def objective(trial):
            n = trial.suggest_int("n", 0, 9)
            if n % 2:
                raise RuntimeError("odd")
            return float(n)

        study.optimize(objective, n_trials=12, n_jobs=3,
                       catch=(RuntimeError,))
        assert len(study.trials) == 12
        states = {t.state for t in study.trials}
        assert states <= {"COMPLETE", "FAIL"}
        # every COMPLETE value is even, every FAIL drew odd
        for t in study.trials:
            assert (t.state == "COMPLETE") == (t.params["n"] % 2 == 0)

    def test_uncaught_error_propagates(self):
        study = Study("u", sampler=RandomSampler(seed=0))

        def objective(trial):
            trial.suggest_int("n", 0, 9)
            raise ValueError("boom")

        with pytest.raises(ValueError, match="boom"):
            study.optimize(objective, n_trials=4)
        # optuna records the crashed trial as FAIL before raising
        assert [t.state for t in study.trials] == ["FAIL"]

    def test_non_numeric_return_recorded_as_fail(self):
        """A None/str objective return crashes at float() AFTER the
        except blocks — it must still be recorded as FAIL before
        propagating, or a sqlite resume's max+1 numbering would skip the
        grid point (the same invariant as an in-objective crash)."""
        study = Study("nn", sampler=RandomSampler(seed=0))

        def objective(trial):
            trial.suggest_int("n", 0, 9)
            return None  # forgot the return value

        with pytest.raises(TypeError):
            study.optimize(objective, n_trials=4)
        assert [t.state for t in study.trials] == ["FAIL"]

    def test_uncaught_error_propagates_from_workers(self):
        study = Study("uw", sampler=RandomSampler(seed=0))

        def objective(trial):
            trial.suggest_int("n", 0, 9)
            raise ValueError("boom")

        with pytest.raises(ValueError, match="boom"):
            study.optimize(objective, n_trials=8, n_jobs=3)
        # every issued trial is recorded (crashes as FAIL) so trial numbers
        # stay contiguous — an unrecorded crash would make a sqlite resume's
        # max+1 numbering skip that grid point forever (ADVICE r3)
        assert all(t.state == "FAIL" for t in study.trials)
        nums = sorted(t.number for t in study.trials)
        assert nums == list(range(len(nums)))


class TestDevicePlacement:
    """optimize(devices=...) — round-robin trial->chip placement.

    Runs on the 8-virtual-CPU conftest; on hardware the same call fans a
    sweep out over the chips of a pod slice (each trial jits + executes on
    its own device, no mesh — trials are independent).
    """

    def test_round_robin_placement(self):
        import jax
        import jax.numpy as jnp

        devices = jax.devices()[:4]
        placed = {}
        lock = threading.Lock()

        def objective(trial):
            n = trial.suggest_int("n", 0, 9)
            x = jnp.asarray(float(n)) + 1.0  # uncommitted -> default device
            with lock:
                placed[trial.number] = x.device
            return float(x)

        study = Study("dev", sampler=RandomSampler(seed=0))
        study.optimize(objective, n_trials=12, devices=devices)
        assert len(placed) == 12
        for number, dev in placed.items():
            assert dev == devices[number % 4], (number, dev)

    def test_single_device_sequential(self):
        import jax
        import jax.numpy as jnp

        dev = jax.devices()[-1]
        seen = []

        def objective(trial):
            trial.suggest_int("n", 0, 3)
            seen.append(jnp.zeros(()).device)
            return 0.0

        study = Study("dev1", sampler=RandomSampler(seed=1))
        study.optimize(objective, n_trials=3, devices=[dev])
        assert seen == [dev] * 3

    def test_empty_devices_rejected(self):
        study = Study("dev0", sampler=RandomSampler(seed=2))
        with pytest.raises(ValueError, match="non-empty"):
            study.optimize(lambda t: 0.0, n_trials=1, devices=[])


class TestStudyCLIFlags:
    """--n_jobs / --spread_devices reach Study.optimize from each driver."""

    @pytest.mark.parametrize(
        "mod", ["conv_study", "autoreg_study", "mlp_study"])
    def test_flags_forwarded(self, mod, tmp_path, monkeypatch):
        import importlib

        import jax

        m = importlib.import_module(f"motionmixerconv_tpu.sweep.{mod}")
        captured = {}

        def fake_optimize(self, objective, n_trials=40, timeout=None,
                          catch=(), n_jobs=1, devices=None):
            captured.update(n_jobs=n_jobs, devices=devices)

        monkeypatch.setattr(Study, "optimize", fake_optimize)
        m.main(["--study_dir", str(tmp_path / mod),
                "--n_jobs", "3", "--spread_devices"])
        assert captured["n_jobs"] == 3
        assert list(captured["devices"]) == jax.devices()

    @pytest.mark.parametrize(
        "mod", ["conv_study", "autoreg_study", "mlp_study"])
    def test_pruner_flag(self, mod, tmp_path, monkeypatch):
        import importlib

        from motionmixerconv_tpu.sweep import MedianPruner

        m = importlib.import_module(f"motionmixerconv_tpu.sweep.{mod}")
        captured = {}

        def fake_optimize(self, objective, **kw):
            captured["pruner"] = self.pruner

        monkeypatch.setattr(Study, "optimize", fake_optimize)
        m.main(["--study_dir", str(tmp_path / "a"), "--pruner", "median"])
        assert isinstance(captured["pruner"], MedianPruner)
        m.main(["--study_dir", str(tmp_path / "b")])
        assert captured["pruner"] is None

    @pytest.mark.parametrize(
        "mod", ["conv_study", "autoreg_study", "mlp_study"])
    def test_defaults_stay_sequential(self, mod, tmp_path, monkeypatch):
        import importlib

        m = importlib.import_module(f"motionmixerconv_tpu.sweep.{mod}")
        captured = {}

        def fake_optimize(self, objective, n_trials=40, timeout=None,
                          catch=(), n_jobs=1, devices=None):
            captured.update(n_jobs=n_jobs, devices=devices)

        monkeypatch.setattr(Study, "optimize", fake_optimize)
        m.main(["--study_dir", str(tmp_path / mod)])
        assert captured == {"n_jobs": 1, "devices": None}


class TestNJobsTPE:
    def test_tpe_observes_all_trials(self):
        study = Study("t", sampler=TPESampler(seed=3),
                      directions=["minimize"])

        def objective(trial):
            x = trial.suggest_float("x", -2.0, 2.0)
            return x * x

        study.optimize(objective, n_trials=16, n_jobs=4)
        done = [t for t in study.trials if t.state == "COMPLETE"]
        assert len(done) == 16
        # sampler history saw every completed trial
        assert len(study.sampler._history) == 16
        assert study.best_trial.values[0] == min(
            t.values[0] for t in done)
