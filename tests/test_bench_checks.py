"""Honesty gates + outage behavior of the bench harness (VERDICT r3 items
1-2): the dtype-aware FLOP ceiling, the HBM bandwidth ceiling, and bench.py's
bounded-probe → structured-skip path (rc 0, machine-readable JSON, torch
baselines still present).
"""

import json
import os
import subprocess
import sys

import pytest

from motionmixerconv_tpu.profiling import (
    PEAK_BYTES,
    PEAK_FLOPS,
    PEAK_FLOPS_F32,
    check_physical_ceilings,
    peak_flops_for,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KIND = "TPU v5 lite"


class TestCeilings:
    def test_f32_run_gated_by_f32_peak(self):
        """An f32 measurement between the f32 and bf16 peaks must raise —
        this is exactly the 2x-inflated case the bf16-only gate passed."""
        flops = (PEAK_FLOPS_F32[KIND] + PEAK_FLOPS[KIND]) / 2
        with pytest.raises(RuntimeError, match="float32 peak"):
            check_physical_ceilings(
                "fabricated", device_kind=KIND, dtype="float32",
                flops_per_s=flops)

    def test_bf16_run_allows_full_mxu_rate(self):
        flops = (PEAK_FLOPS_F32[KIND] + PEAK_FLOPS[KIND]) / 2
        check_physical_ceilings(  # same number, bf16 dtype: legal
            "ok", device_kind=KIND, dtype="bfloat16", flops_per_s=flops)
        with pytest.raises(RuntimeError, match="bfloat16 peak"):
            check_physical_ceilings(
                "fab", device_kind=KIND, dtype="bfloat16",
                flops_per_s=PEAK_FLOPS[KIND] * 1.01)

    def test_bandwidth_roof(self):
        roof = PEAK_BYTES[KIND]
        check_physical_ceilings(  # within the documented 5% estimate slack
            "ok", device_kind=KIND, bytes_per_s=roof * 1.04)
        with pytest.raises(RuntimeError, match="HBM bytes/s"):
            check_physical_ceilings(
                "fab", device_kind=KIND, bytes_per_s=roof * 1.10)

    def test_bytes_breach_tolerated_when_not_strict(self):
        """strict_bytes=False: a bytes-roof breach is reported as a byte-
        model overcount (returns True) instead of raising — the measured r4
        case is the doubling control, whose fused VMEM intermediates are
        counted by cost_analysis but never touch HBM. FLOP breaches still
        raise regardless."""
        roof = PEAK_BYTES[KIND]
        assert check_physical_ceilings(
            "fused-model", device_kind=KIND, bytes_per_s=roof * 1.10,
            strict_bytes=False) is True
        assert check_physical_ceilings(
            "ok", device_kind=KIND, bytes_per_s=roof * 0.5,
            strict_bytes=False) is False
        with pytest.raises(RuntimeError, match="float32 peak"):
            check_physical_ceilings(
                "fab", device_kind=KIND, dtype="float32",
                flops_per_s=PEAK_FLOPS[KIND], strict_bytes=False)

    def test_unknown_device_checks_nothing(self):
        check_physical_ceilings(
            "cpu-run", device_kind="cpu", dtype="float32",
            flops_per_s=1e30, bytes_per_s=1e30)

    def test_peak_table_selection(self):
        import numpy as np

        assert peak_flops_for(KIND, np.float32) == PEAK_FLOPS_F32[KIND]
        assert peak_flops_for(KIND, "bfloat16") == PEAK_FLOPS[KIND]
        assert peak_flops_for("nope", "float32") is None


class TestProbe:
    def test_healthy_probe(self):
        sys.path.insert(0, REPO)
        try:
            import bench
        finally:
            sys.path.remove(REPO)
        ok, tail = bench._probe_device(timeout_s=10, cmd=["true"])
        assert ok and tail == ""

    def test_failing_probe_returns_tail(self):
        sys.path.insert(0, REPO)
        try:
            import bench
        finally:
            sys.path.remove(REPO)
        ok, tail = bench._probe_device(
            timeout_s=10,
            cmd=[sys.executable, "-c",
                 "import sys; sys.stderr.write('UNAVAILABLE: boom');"
                 "sys.exit(1)"])
        assert not ok and "UNAVAILABLE" in tail

    def test_hung_probe_hits_wall_clock_cap(self):
        sys.path.insert(0, REPO)
        try:
            import bench
        finally:
            sys.path.remove(REPO)
        ok, tail = bench._probe_device(timeout_s=0.2, cmd=["sleep", "30"])
        assert not ok and "wall-clock cap" in tail


class TestSkipRecord:
    def test_bench_emits_structured_skip_rc0(self, tmp_path):
        """bench.py with an unavailable backend: rc 0, ONE parseable JSON
        line with the skip reason, probe tail, and cached torch baselines —
        never the rc-124 shell of BENCH_r03."""
        env = dict(os.environ)
        env["MMC_BENCH_PROBE_CMD"] = "false"
        env["MMC_BENCH_NO_LIVE_BASELINE"] = "1"
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, timeout=120, env=env, cwd=str(tmp_path),
        )
        assert r.returncode == 0, r.stderr.decode()[-500:]
        rec = json.loads(r.stdout.decode().strip().splitlines()[-1])
        assert rec["skipped"] == "backend unavailable"
        assert rec["metric"] == "train_sequences_per_sec"
        assert rec["value"] is None and rec["vs_baseline"] is None
        # the torch-CPU baselines the bench CAN measure are still emitted
        # (from the committed cache under MMC_BENCH_NO_LIVE_BASELINE)
        assert rec["torch_baselines"].get("h36m_conv_b2048", 0) > 0

    def test_hung_measurement_hits_budget(self, tmp_path):
        """A backend that hangs (not raises) mid-measurement: the child is
        killed at MMC_BENCH_MEASURE_BUDGET_S and a structured skip record
        still comes out with rc 0 (the BENCH_r03 failure mode was a hang
        inside measure_jax that no in-process guard could interrupt)."""
        env = dict(os.environ)
        env["MMC_BENCH_PROBE_CMD"] = "true"  # healthy probe
        env["MMC_BENCH_NO_LIVE_BASELINE"] = "1"
        env["MMC_BENCH_CHILD_CMD"] = "sleep 60"
        env["MMC_BENCH_MEASURE_BUDGET_S"] = "2"
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, timeout=120, env=env, cwd=str(tmp_path),
        )
        assert r.returncode == 0, r.stderr.decode()[-500:]
        rec = json.loads(r.stdout.decode().strip().splitlines()[-1])
        assert rec["skipped"] == "measurement exceeded wall-clock budget"
        assert rec["value"] is None
        assert rec["torch_baselines"].get("h36m_conv_b2048", 0) > 0

    def test_measurement_child_record_roundtrip(self, tmp_path):
        """A fake child that prints a minimal measurement record: the parent
        assembles the normal full output from it (no skip)."""
        fake = tmp_path / "fake_child.py"
        ours = {
            k: {"tput": 1000.0, "mfu": 0.01, "hbm_frac": 0.5,
                "flops_per_step": 1e6, "bytes_per_step": 1e6,
                "gbytes_per_s": 100.0, "per_step_us": 100.0,
                "timing": {"median_s": 0.1, "min_s": 0.1, "max_s": 0.1,
                           "reps": 3}}
            for k in ("h36m_conv_b50", "h36m_conv_b512", "h36m_conv_b2048",
                      "amass_mlp_b200", "h36m_autoreg_b50")
        }
        ours["h36m_full_epoch_s"] = {"wall_s": 1.0, "min_s": 1.0,
                                     "max_s": 1.0}
        ours["serving_fused_mc_b8_ms"] = {
            "ms_synced": 5.0, "ms_chained": 1.0,
            "timing": {"median_s": 0.005, "min_s": 0.005, "max_s": 0.005,
                       "reps": 3}}
        fake.write_text(
            "import json\n"
            f"print(json.dumps({{'ours': {ours!r}, 'device': 'fake'}}))\n")
        env = dict(os.environ)
        env["MMC_BENCH_PROBE_CMD"] = "true"
        env["MMC_BENCH_NO_LIVE_BASELINE"] = "1"
        env["MMC_BENCH_CHILD_CMD"] = f"{sys.executable} {fake}"
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, timeout=120, env=env, cwd=str(tmp_path),
        )
        assert r.returncode == 0, r.stderr.decode()[-500:]
        rec = json.loads(r.stdout.decode().strip().splitlines()[-1])
        assert "skipped" not in rec
        assert rec["device"] == "fake"
        # no h36m_conv_b2048_dbl in the record: the parent tolerates the
        # optional config's absence and the flagship is the defaults row
        assert rec["value"] == 1000.0
        assert "defaults" in rec["unit"]
        assert len(rec["configs"]) == 7

    def test_flagship_picks_fastest_b2048_variant(self, tmp_path):
        """When the doubling-encoder config is present AND faster, the
        headline picks it, names the impl in the unit, and scores it
        against the shared h36m_conv_b2048 torch baseline."""
        fake = tmp_path / "fake_child.py"
        row = {"tput": 1000.0, "mfu": 0.01, "hbm_frac": 0.5,
               "flops_per_step": 1e6, "bytes_per_step": 1e6,
               "gbytes_per_s": 100.0, "per_step_us": 100.0,
               "timing": {"median_s": 0.1, "min_s": 0.1, "max_s": 0.1,
                          "reps": 3}}
        ours = {k: dict(row)
                for k in ("h36m_conv_b50", "h36m_conv_b512",
                          "h36m_conv_b2048", "h36m_conv_b2048_dbl",
                          "amass_mlp_b200", "h36m_autoreg_b50")}
        ours["h36m_conv_b2048_dbl"]["tput"] = 1046.0
        ours["h36m_full_epoch_s"] = {"wall_s": 1.0, "min_s": 1.0,
                                     "max_s": 1.0}
        ours["serving_fused_mc_b8_ms"] = {
            "ms_synced": 5.0, "ms_chained": 1.0,
            "timing": {"median_s": 0.005, "min_s": 0.005, "max_s": 0.005,
                       "reps": 3}}
        fake.write_text(
            "import json\n"
            f"print(json.dumps({{'ours': {ours!r}, 'device': 'fake'}}))\n")
        env = dict(os.environ)
        env["MMC_BENCH_PROBE_CMD"] = "true"
        env["MMC_BENCH_NO_LIVE_BASELINE"] = "1"
        env["MMC_BENCH_CHILD_CMD"] = f"{sys.executable} {fake}"
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, timeout=120, env=env, cwd=str(tmp_path),
        )
        assert r.returncode == 0, r.stderr.decode()[-500:]
        rec = json.loads(r.stdout.decode().strip().splitlines()[-1])
        assert rec["value"] == 1046.0
        assert "doubling" in rec["unit"]
        assert len(rec["configs"]) == 8
        dbl = next(c for c in rec["configs"]
                   if c["metric"] == "h36m_conv_b2048_dbl")
        direct = next(c for c in rec["configs"]
                      if c["metric"] == "h36m_conv_b2048")
        # same torch baseline on both rows
        assert dbl["baseline_seq_per_s"] == direct["baseline_seq_per_s"]

    def test_r5_rows_assembled(self, tmp_path):
        """The round-5 rows (angle train, euler-chain eval, AIS, amass
        b1024, serving throughput) flow through the parent assembly."""
        row = {"tput": 1000.0, "mfu": 0.01, "hbm_frac": 0.5,
               "flops_per_step": 1e6, "bytes_per_step": 1e6,
               "gbytes_per_s": 100.0, "per_step_us": 100.0,
               "timing": {"median_s": 0.1, "min_s": 0.1, "max_s": 0.1,
                          "reps": 3}}
        ours = {k: dict(row)
                for k in ("h36m_conv_b50", "h36m_conv_b512",
                          "h36m_conv_b2048", "h36m_conv_b2048_dbl",
                          "h36m_conv_angle_b50", "ais_conv_b50",
                          "amass_mlp_b200", "amass_mlp_b1024",
                          "h36m_autoreg_b50")}
        ours["h36m_angle_euler_eval"] = {
            "tput": 5000.0, "mfu": 0.01, "hbm_frac": None,
            "bytes_model_overcount": True, "gbytes_per_s": 10.0,
            "per_step_us": 10.0,
            "timing": {"median_s": 0.01, "min_s": 0.01, "max_s": 0.01,
                       "reps": 3}}
        ours["h36m_full_epoch_s"] = {"wall_s": 1.0, "min_s": 1.0,
                                     "max_s": 1.0}
        ours["serving_fused_mc_b8_ms"] = {
            "ms_synced": 5.0, "ms_chained": 1.0,
            "timing": {"median_s": 0.005, "min_s": 0.005, "max_s": 0.005,
                       "reps": 3}}
        ours["serving_throughput_mc"] = {
            "direct": {"rps": 800.0, "n_requests": 4800, "p50_ms": 40.0,
                       "p99_ms": 80.0, "window_s": 6.0, "clients": 32,
                       "mean_batch_rows": 30.0},
            "http": {"rps": 400.0, "n_requests": 1600, "p50_ms": 40.0,
                     "p99_ms": 90.0, "window_s": 4.0, "clients": 16}}
        fake = tmp_path / "fake_child.py"
        fake.write_text(
            "import json\n"
            f"print(json.dumps({{'ours': {ours!r}, 'device': 'fake'}}))\n")
        env = dict(os.environ)
        env["MMC_BENCH_PROBE_CMD"] = "true"
        env["MMC_BENCH_NO_LIVE_BASELINE"] = "1"
        env["MMC_BENCH_CHILD_CMD"] = f"{sys.executable} {fake}"
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, timeout=120, env=env, cwd=str(tmp_path),
        )
        assert r.returncode == 0, r.stderr.decode()[-500:]
        rec = json.loads(r.stdout.decode().strip().splitlines()[-1])
        assert "skipped" not in rec
        metrics = [c["metric"] for c in rec["configs"]]
        for m in ("h36m_conv_angle_b50", "ais_conv_b50", "amass_mlp_b1024",
                  "h36m_angle_euler_eval", "serving_throughput_mc"):
            assert m in metrics, metrics
        assert len(rec["configs"]) == 13
        ev = next(c for c in rec["configs"]
                  if c["metric"] == "h36m_angle_euler_eval")
        assert ev["bytes_model_overcount"] is True
        assert ev["hbm_frac"] is None
        tp = next(c for c in rec["configs"]
                  if c["metric"] == "serving_throughput_mc")
        assert tp["value"] == 800.0
        assert tp["http_rps"] == 400.0
        assert tp["p99_ms"] == 80.0

    def test_backend_error_classifier(self):
        sys.path.insert(0, REPO)
        try:
            import bench
        finally:
            sys.path.remove(REPO)
        assert bench._is_backend_unavailable(RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: TPU backend "
            "setup/compile error (Unavailable)."))
        assert not bench._is_backend_unavailable(ValueError("shape mismatch"))
