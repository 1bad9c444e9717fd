"""Convergence-to-quality regression vs the committed reference runs.

tests/golden/parity_runs.json + parity_init.npz were produced by
tools/parity_runs.py: the torch reference trained with its own code on a
synthetic corpus, with its init state_dict exported. This test re-runs the
JAX matched-init side (same corpus seed, same init, same schedule — own
shuffling and dropout) through the REAL CLI runners and asserts the final
metrics stay within a few percent of the recorded torch results.

Recorded agreement at generation time (PARITY_RUNS.md): h36m train/val/test
within 0.5-7.4% (jax slightly better), amass within 0.0-0.3%, autoregressive
within 0.6-1.7%.
"""

import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def recorded():
    with open(os.path.join(GOLDEN, "parity_runs.json")) as f:
        return json.load(f)


@pytest.mark.slow
def test_h36m_matched_init_convergence(recorded, tmp_path_factory):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(GOLDEN), "..", "tools"))
    import parity_runs as pr

    pr.OUT_INIT = os.path.join(GOLDEN, "parity_init.npz")
    work = str(tmp_path_factory.mktemp("parity_h36m"))
    from motionmixerconv_tpu.data import fixtures

    c = recorded["h36m_cfg"]
    data_dir = os.path.join(work, "h36m")
    fixtures.make_h36m_corpus(data_dir, n_frames=c["n_frames"],
                              seed=c["data_seed"])
    ours = pr.jax_h36m(data_dir, work, init_variables=pr._load_init("h36m"))
    torch_side = recorded["results"]["torch_h36m"]

    for key, tol in (("train", 0.15), ("val", 0.12), ("test_mpjpe", 0.15)):
        rel = abs(ours[key] - torch_side[key]) / abs(torch_side[key])
        assert rel < tol, (key, ours[key], torch_side[key])
    assert abs(ours["test_auc_pck"] - torch_side["test_auc_pck"]) < 0.05
    # the whole trajectory tracks, not just the endpoint (both sides have
    # escaped the plateau by epoch 6 thanks to the shared init)
    t = np.asarray(torch_side["train_per_epoch"])
    j = np.asarray(ours["train_per_epoch"])
    np.testing.assert_allclose(j, t, rtol=0.2)


@pytest.mark.slow
def test_h36m_lockstep_convergence(recorded, tmp_path_factory):
    """The LOCKSTEP pair (VERDICT r2 item 4): dropout off, identical
    per-epoch batch-order stream on both sides. Recorded agreement (TPU,
    PARITY_RUNS.md): train-loss trajectory within 1.02% across all 20
    epochs, final train 1.0% / val 0.45%; the test metric matches to 0.02%
    for the first 5 epochs (eval-pipeline parity at matched params), then
    drifts to 4.3% as the converged points separate after the lr milestone.
    Tolerances here add margin for the CPU re-run vs the recorded TPU run.
    """
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(GOLDEN), "..", "tools"))
    import parity_runs as pr

    if "torch_h36m_sync" not in recorded["results"]:
        pytest.skip("lockstep phase not recorded in this golden")
    pr.OUT_INIT = os.path.join(GOLDEN, "parity_init.npz")
    work = str(tmp_path_factory.mktemp("parity_h36m_sync"))
    from motionmixerconv_tpu.data import fixtures

    c = recorded["h36m_cfg"]
    data_dir = os.path.join(work, "h36m")
    fixtures.make_h36m_corpus(data_dir, n_frames=c["n_frames"],
                              seed=c["data_seed"])
    ours = pr.jax_h36m_sync(data_dir, work,
                            init_variables=pr._load_init("h36m_sync"))
    torch_side = recorded["results"]["torch_h36m_sync"]

    for key, tol in (("train", 0.02), ("val", 0.02), ("test_mpjpe", 0.06)):
        rel = abs(ours[key] - torch_side[key]) / abs(torch_side[key])
        assert rel < tol, (key, ours[key], torch_side[key])
    assert abs(ours["test_auc_pck"] - torch_side["test_auc_pck"]) < 0.03
    # the whole train trajectory tracks tightly — this is the lockstep claim
    np.testing.assert_allclose(
        np.asarray(ours["train_per_epoch"]),
        np.asarray(torch_side["train_per_epoch"]), rtol=0.025,
    )
    # eval-pipeline parity: test metric agrees while params are still close
    np.testing.assert_allclose(
        np.asarray(ours["test_per_epoch"][:5]),
        np.asarray(torch_side["test_per_epoch"][:5]), rtol=0.01,
    )


def test_h36m_lockstep_drift_curve_shape(recorded):
    """The drift story DEMONSTRATED (VERDICT r3 item 4): the committed
    per-epoch parameter-distance curves between the lockstep twins must
    have the accumulated-round-off shape, which a latent semantic mismatch
    could not produce:

    - growth happens at full lr and freezes when the milestone drops lr
      10x (measured: post-milestone increments ~170x smaller) — a schedule
      or semantics mismatch around the milestone would JUMP there instead;
    - the lr/10 control pair drifts much less at identical step counts
      (round-off per step is amplified by the Adam step size);
    - the test-metric gap TRACKS the parameter distance (near-zero while
      params are close, grows and saturates with them).
    """
    r = recorded["results"]
    if "jax_h36m_sync_drift" not in r:
        pytest.skip("drift phases not recorded in this golden")
    dr = np.asarray(r["jax_h36m_sync_drift"]["param_drift_rel"])
    dl = np.asarray(r["jax_h36m_sync_lowlr"]["param_drift_rel"])
    milestone = 15  # H36M_SYNC_CFG milestones=[15]
    assert np.all(np.isfinite(dr)) and np.all(dr < 1.0)
    pre = float(np.max(np.diff(dr[: milestone + 1])))
    post = float(np.max(np.abs(np.diff(dr[milestone:]))))
    assert post < 0.1 * pre, (pre, post)  # lr drop freezes the drift
    # drift scales with the step size: lr/10 => far smaller distance at
    # the same step count
    assert dl[-1] < 0.7 * dr[-1], (dl[-1], dr[-1])
    assert dl[0] < 0.7 * dr[0], (dl[0], dr[0])
    # the test-metric gap tracks the parameter distance
    gaps = np.asarray([
        abs(a - b) / abs(b)
        for a, b in zip(r["jax_h36m_sync_drift"]["test_per_epoch"],
                        r["torch_h36m_sync_drift"]["test_per_epoch"])])
    assert gaps[0] < 1e-3  # eval-pipeline parity at near-matched params
    assert float(np.corrcoef(dr, gaps)[0, 1]) > 0.5
    low_gaps = np.asarray([
        abs(a - b) / abs(b)
        for a, b in zip(r["jax_h36m_sync_lowlr"]["test_per_epoch"],
                        r["torch_h36m_sync_lowlr"]["test_per_epoch"])])
    assert low_gaps[-1] < gaps[-1]  # metric gap scales down with lr too
    # internal consistency: the capture re-run reproduced the original
    # lockstep run bit-for-bit on the torch side
    assert (r["torch_h36m_sync_drift"]["train_per_epoch"]
            == r["torch_h36m_sync"]["train_per_epoch"])


@pytest.mark.slow
def test_h36m_lockstep_drift_endpoint_reproduces(recorded, tmp_path_factory):
    """Re-run the JAX lockstep side and recompute the drift-curve ENDPOINT
    against the committed torch final-epoch params (parity_drift.npz):
    current code must land at the recorded distance, not merely inside
    loose metric tolerances."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(GOLDEN), "..", "tools"))
    import jax
    import parity_runs as pr

    from motionmixerconv_tpu.models import convert_conv_mixer
    from motionmixerconv_tpu.train.state import load_variables

    r = recorded["results"]
    if "jax_h36m_sync_drift" not in r:
        pytest.skip("drift phases not recorded in this golden")
    pr.OUT_INIT = os.path.join(GOLDEN, "parity_init.npz")
    work = str(tmp_path_factory.mktemp("parity_drift"))
    from motionmixerconv_tpu.data import fixtures

    c = recorded["h36m_cfg"]
    data_dir = os.path.join(work, "h36m")
    fixtures.make_h36m_corpus(data_dir, n_frames=c["n_frames"],
                              seed=c["data_seed"])
    init = pr._load_init("h36m_sync_drift")
    pr.jax_h36m_sync(data_dir, work, init_variables=init,
                     tag="h36m_sync_drift")

    def flat(params):
        return np.concatenate([
            np.ravel(np.asarray(x))
            for x in jax.tree_util.tree_leaves(params)]).astype(np.float64)

    ckpt = os.path.join(work, "jax_h36m_sync_drift",
                        f"h36_3d_{c['output_n']}frames_ckpt", "model.ckpt")
    ours = flat(load_variables(ckpt, init)["params"])
    data = np.load(os.path.join(GOLDEN, "parity_drift.npz"))
    sd = {k.split("::", 1)[1]: data[k] for k in data.files
          if k.startswith("h36m_sync_drift::")}
    ref = flat(convert_conv_mixer(sd, num_blocks=c["num_blocks"])["params"])
    rel = float(np.linalg.norm(ours - ref) / np.linalg.norm(ref))
    rec = r["jax_h36m_sync_drift"]["param_drift_rel"][-1]
    # the curve saturates in a chaotic regime; platform/XLA-version noise
    # moves the endpoint a little, a semantic change moves it a lot
    assert abs(rel - rec) < 0.15, (rel, rec)


@pytest.mark.slow
def test_amass_matched_init_convergence(recorded, tmp_path_factory):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(GOLDEN), "..", "tools"))
    import parity_runs as pr

    pr.OUT_INIT = os.path.join(GOLDEN, "parity_init.npz")
    work = str(tmp_path_factory.mktemp("parity_amass"))
    from motionmixerconv_tpu.data import fixtures

    c = recorded["amass_cfg"]
    data_dir = os.path.join(work, "amass2k")
    fixtures.make_amass_corpus(data_dir, n_frames=c["n_frames"],
                               seed=c["data_seed"])
    ours = pr.jax_amass(data_dir, work, init_variables=pr._load_init("amass"))
    torch_side = recorded["results"]["torch_amass"]

    for key, tol in (("train", 0.05), ("val", 0.05), ("test_mpjpe", 0.05)):
        rel = abs(ours[key] - torch_side[key]) / abs(torch_side[key])
        assert rel < tol, (key, ours[key], torch_side[key])
    t = np.asarray(torch_side["train_per_epoch"])
    j = np.asarray(ours["train_per_epoch"])
    np.testing.assert_allclose(j, t, rtol=0.1)


def test_autoreg_flagship_recorded_agreement(recorded):
    """The committed flagship autoregressive pair (reference autoreg CLI
    defaults: hidden 192, 8 channels, BatchNorm; run on the TPU by
    tools/parity_runs.py — too expensive to re-train on the CPU conftest)
    agrees to the tolerances PARITY_RUNS.md documents."""
    if "torch_ar" not in recorded["results"]:
        pytest.skip("autoreg phase not recorded in this golden")
    t = recorded["results"]["torch_ar"]
    j = recorded["results"]["jax_ar"]
    for key in ("train", "val", "test_mpjpe"):
        rel = abs(j[key] - t[key]) / abs(t[key])
        assert rel < 0.05, (key, j[key], t[key])
    assert abs(j["test_auc_pck"] - t["test_auc_pck"]) < 0.02
    np.testing.assert_allclose(j["train_per_epoch"], t["train_per_epoch"],
                               rtol=0.06)


@pytest.mark.slow
def test_autoreg_matched_init_convergence(recorded, tmp_path_factory):
    """Autoregressive trainer vs the reference's own train_autoregressive
    (teacher-forcing schedule + closed-loop feedback + BatchNorm), re-run
    live on the AR_SMALL_CFG twin — same trainer semantics as the flagship
    autoreg defaults at ~1/60 the FLOPs so it fits the CPU conftest.

    This config sits on the early optimization plateau, where both
    frameworks take near-identical steps: the recorded torch and TPU-jax
    trajectories match to 0.01% across all 930 optimizer steps (TF switch,
    BatchNorm harvesting and the milestone decay included) — so the
    trajectory assertion here is tight."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(GOLDEN), "..", "tools"))
    import parity_runs as pr

    if "torch_ar_small" not in recorded["results"]:
        pytest.skip("autoreg small phase not recorded in this golden")
    pr.OUT_INIT = os.path.join(GOLDEN, "parity_init.npz")
    work = str(tmp_path_factory.mktemp("parity_ar"))
    from motionmixerconv_tpu.data import fixtures

    c = recorded["h36m_cfg"]  # the AR runs share the H36M corpus
    data_dir = os.path.join(work, "h36m")
    fixtures.make_h36m_corpus(data_dir, n_frames=c["n_frames"],
                              seed=c["data_seed"])
    ours = pr.jax_h36m_autoreg(data_dir, work,
                               init_variables=pr._load_init("ar_small"),
                               c=pr.AR_SMALL_CFG, tag="ar_small")
    torch_side = recorded["results"]["torch_ar_small"]

    for key, tol in (("train", 0.05), ("val", 0.05), ("test_mpjpe", 0.05)):
        rel = abs(ours[key] - torch_side[key]) / abs(torch_side[key])
        assert rel < tol, (key, ours[key], torch_side[key])
    assert abs(ours["test_auc_pck"] - torch_side["test_auc_pck"]) < 0.05
    t = np.asarray(torch_side["train_per_epoch"])
    j = np.asarray(ours["train_per_epoch"])
    np.testing.assert_allclose(j, t, rtol=0.05)
    # both sides descend the plateau identically, they don't just sit still
    assert j[-1] < j[0] - 3 and t[-1] < t[0] - 3
