"""Probe 15: Study.optimize(n_jobs) overlap on the tunneled TPU.

DESIGN.md claims concurrent trials overlap host-side work (data prep,
logging, relay round trips) with device execution on the async-dispatch
runtime. This measures it: a study of REAL (tiny) H36M training trials —
run_h36m through the conv-study objective path on a synthetic corpus —
sequentially and with n_jobs 2 and 4. Each trial is dominated by per-epoch
host syncs + eval fetches (the relay RTT is ~28-30 ms each), exactly the
cost n_jobs hides.

Reports wall-clock per configuration and the speedup vs sequential.
Trials use distinct logdirs (per trial number) and identical work, so the
comparison is apples-to-apples; the device executes the same programs in
all configurations (one compilation each, warmed by a throwaway trial).

Writes /tmp/perf_probe15.json.
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time

RESULTS = {}


def log(m):
    print(m, flush=True)


def _make_corpus():
    from motionmixerconv_tpu.data import fixtures

    d = tempfile.mkdtemp(prefix="probe15_data_")
    fixtures.make_h36m_corpus(d, n_frames=400, seed=1)
    return d


def _objective_factory(data_dir, study_dir):
    from motionmixerconv_tpu.sweep.conv_study import parse_args

    def objective(trial):
        import os

        from motionmixerconv_tpu.cli._runner import build_conv_mixer, run_h36m

        args = parse_args([
            "--data_dir", data_dir, "--n_epochs", "2", "--skip_rate", "5",
            "--actions_to_consider", "walking", "--batch_size", "128",
        ])
        args.loss_type = "mpjpe"
        args.pose_dim = 66
        args.delta_x = False
        args.num_blocks = 2
        args.hidden_dim = trial.suggest_int("hidden_dim", 30, 30)
        args.save_path = os.path.join(study_dir, f"trial{trial.number}")
        model = build_conv_mixer(args, 66, 66, args.input_n, args.output_n)
        history, _, _ = run_h36m(args, model=model, model_name="p15")
        return history["test"][-1]

    return objective


def main():
    from motionmixerconv_tpu.sweep import RandomSampler, Study

    data_dir = _make_corpus()
    n_trials = 8

    # warm: one throwaway trial compiles every program the trials reuse
    warm_dir = tempfile.mkdtemp(prefix="probe15_warm_")
    Study("warm", sampler=RandomSampler(seed=0)).optimize(
        _objective_factory(data_dir, warm_dir), n_trials=1)
    shutil.rmtree(warm_dir, ignore_errors=True)

    for n_jobs in (1, 2, 4):
        study_dir = tempfile.mkdtemp(prefix=f"probe15_j{n_jobs}_")
        study = Study(f"j{n_jobs}", sampler=RandomSampler(seed=0))
        t0 = time.time()
        study.optimize(_objective_factory(data_dir, study_dir),
                       n_trials=n_trials, n_jobs=n_jobs)
        dt = time.time() - t0
        assert len(study.trials) == n_trials
        assert all(t.state == "COMPLETE" for t in study.trials)
        RESULTS[f"n_jobs={n_jobs}"] = {
            "wall_s": round(dt, 2),
            "s_per_trial": round(dt / n_trials, 2),
        }
        log(f"n_jobs={n_jobs}: {dt:.1f}s for {n_trials} trials")
        shutil.rmtree(study_dir, ignore_errors=True)

    seq = RESULTS["n_jobs=1"]["wall_s"]
    for k, v in RESULTS.items():
        v["speedup_vs_seq"] = round(seq / v["wall_s"], 2)
    shutil.rmtree(data_dir, ignore_errors=True)
    with open("/tmp/perf_probe15.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    log(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
