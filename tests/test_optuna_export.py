"""optuna-RDB-schema export: structural + round-trip assertions.

optuna is not installed in this image, so the export is pinned with raw
sqlite3 against the schema optuna 3.x writes (schema_version 12): table
layout, enum states, internal param representation (categorical -> index),
per-objective value rows, and json user attrs.
"""

import json
import math
import sqlite3

import pytest

from motionmixerconv_tpu.sweep import (
    GridSampler,
    Study,
    export_optuna_sqlite,
)
from motionmixerconv_tpu.sweep.engine import TrialPruned
from motionmixerconv_tpu.sweep.optuna_export import infer_distribution


def _make_study(tmp_path, name="conv_study"):
    db = tmp_path / "native.db"
    study = Study(name, storage=f"sqlite:///{db}", sampler=GridSampler(),
                  directions=("minimize", "maximize"))

    def objective(trial):
        nb = trial.suggest_int("num_blocks", 2, 4)
        lr = trial.suggest_float("lr", 1e-4, 1e-3, step=4.5e-4)
        act = trial.suggest_categorical("activation", ["gelu", "mish"])
        if trial.number == 3:
            raise TrialPruned
        if trial.number == 4:
            raise RuntimeError("boom")
        trial.set_user_attr("walking", {"mpjpe": 12.5})
        return nb * lr, 0.5 if act == "gelu" else 0.25

    study.optimize(objective, n_trials=6, catch=(RuntimeError,))
    return study, db


def test_export_live_study(tmp_path):
    study, _ = _make_study(tmp_path)
    out = tmp_path / "optuna.db"
    names = export_optuna_sqlite(study, str(out))
    assert names == ["conv_study"]

    conn = sqlite3.connect(out)
    tables = {r[0] for r in conn.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    assert {"alembic_version", "version_info", "studies", "study_directions",
            "trials", "trial_values", "trial_params", "trial_user_attributes",
            "trial_system_attributes", "trial_intermediate_values",
            "trial_heartbeats", "study_user_attributes",
            "study_system_attributes"} <= tables

    assert conn.execute("SELECT version_num FROM alembic_version").fetchone()[0]
    sv, lv = conn.execute(
        "SELECT schema_version, library_version FROM version_info").fetchone()
    assert sv == 12 and lv

    sid, sname = conn.execute(
        "SELECT study_id, study_name FROM studies").fetchone()
    assert sname == "conv_study"
    dirs = conn.execute(
        "SELECT objective, direction FROM study_directions WHERE study_id=? "
        "ORDER BY objective", (sid,)).fetchall()
    assert dirs == [(0, "MINIMIZE"), (1, "MAXIMIZE")]

    states = dict(conn.execute(
        "SELECT state, COUNT(*) FROM trials GROUP BY state").fetchall())
    assert states == {"COMPLETE": 4, "PRUNED": 1, "FAIL": 1}

    # reconstruct each trial's params through optuna's internal repr and
    # compare against the engine's own record
    by_number = {t.number: t for t in study.trials}
    for tid, number in conn.execute(
            "SELECT trial_id, number FROM trials"):
        want = by_number[number]
        got = {}
        for pname, pval, dist_json in conn.execute(
                "SELECT param_name, param_value, distribution_json "
                "FROM trial_params WHERE trial_id=?", (tid,)):
            dist = json.loads(dist_json)
            if dist["name"] == "CategoricalDistribution":
                got[pname] = dist["attributes"]["choices"][int(pval)]
            elif dist["name"] == "IntDistribution":
                got[pname] = int(pval)
            else:
                got[pname] = float(pval)
        assert got == pytest.approx(want.params)

        vals = [r[0] for r in conn.execute(
            "SELECT value FROM trial_values WHERE trial_id=? "
            "ORDER BY objective", (tid,))]
        assert vals == pytest.approx(want.values or [])
        for r in conn.execute(
                "SELECT value_type FROM trial_values WHERE trial_id=?",
                (tid,)):
            assert r[0] == "FINITE"

        attrs = {k: json.loads(v) for k, v in conn.execute(
            "SELECT key, value_json FROM trial_user_attributes "
            "WHERE trial_id=?", (tid,))}
        assert attrs == want.user_attrs
    conn.close()


def test_export_from_native_file(tmp_path):
    """Exporting from the stored native sqlite (no live Study) reproduces
    the same trial set; directions default to minimize."""
    study, db = _make_study(tmp_path)
    out = tmp_path / "from_file.db"
    names = export_optuna_sqlite(str(db), str(out))
    assert names == ["conv_study"]
    conn = sqlite3.connect(out)
    n = conn.execute("SELECT COUNT(*) FROM trials").fetchone()[0]
    assert n == len(study.trials)
    # grid spaces were persisted -> the int param exports as IntDistribution
    dist = json.loads(conn.execute(
        "SELECT distribution_json FROM trial_params WHERE param_name="
        "'num_blocks' LIMIT 1").fetchone()[0])
    assert dist["name"] == "IntDistribution"
    assert (dist["attributes"]["low"], dist["attributes"]["high"]) == (2, 4)
    # datetimes come from the native t column
    start = conn.execute("SELECT datetime_start FROM trials LIMIT 1").fetchone()[0]
    assert start and start[:2] == "20"
    conn.close()


def test_distribution_inference():
    assert infer_distribution([2, 3, 4])["name"] == "IntDistribution"
    assert infer_distribution([2, 4, 8])["name"] == "CategoricalDistribution"
    d = infer_distribution([0.1, 0.55, 1.0])
    assert d["name"] == "FloatDistribution"
    assert d["attributes"]["low"] == pytest.approx(0.1)
    assert d["attributes"]["high"] == pytest.approx(1.0)
    assert infer_distribution(["a", "b"])["name"] == "CategoricalDistribution"
    assert infer_distribution([True, False])["name"] == "CategoricalDistribution"
    # non-finite floats fall back to categorical
    assert infer_distribution([0.1, math.inf])["name"] == "CategoricalDistribution"


def test_inf_values_encoded(tmp_path):
    study = Study("s", directions=("minimize",))
    study.optimize(lambda t: math.inf if t.number else 1.0, n_trials=2)
    out = tmp_path / "inf.db"
    export_optuna_sqlite(study, str(out))
    conn = sqlite3.connect(out)
    rows = conn.execute(
        "SELECT t.number, v.value, v.value_type FROM trial_values v "
        "JOIN trials t ON t.trial_id = v.trial_id ORDER BY t.number"
    ).fetchall()
    assert rows == [(0, 1.0, "FINITE"), (1, 0.0, "INF_POS")]
    conn.close()
