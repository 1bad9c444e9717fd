"""viz/live.py — the working h36_3d_viz.py equivalent (VERDICT r3 item 8)."""

import os

import numpy as np
import pytest

from motionmixerconv_tpu.data import fixtures


def _synthetic_walk(t=6, seed=0):
    rs = np.random.RandomState(seed)
    base = rs.randn(32, 3) * 100.0
    seq = base[None] + np.cumsum(rs.randn(t, 1, 3) * 5.0, axis=0)
    return seq.astype(np.float32)


def test_pose_animation_saves_gif(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from motionmixerconv_tpu.viz.live import pose_animation

    gt = _synthetic_walk(seed=0)
    pred = _synthetic_walk(seed=1)
    fig, anim = pose_animation(gt, pred, fps=5, title="t")
    path = str(tmp_path / "anim.gif")
    anim.save(path, writer="pillow", fps=5)
    assert os.path.getsize(path) > 1000
    # both skeletons drawn: one line per edge per sequence
    from motionmixerconv_tpu.viz.live import H36M_CONNECT

    assert len(fig.axes[0].lines) == 2 * len(H36M_CONNECT)
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_pose_animation_rejects_bad_shapes():
    from motionmixerconv_tpu.viz.live import pose_animation

    with pytest.raises(AssertionError):
        pose_animation(np.zeros((5, 31, 3)), np.zeros((5, 31, 3)))


def test_predict_windows_decodes_delta_x(tmp_path):
    """Velocity-mode checkpoints must decode through delta_2_gt: with all
    weights zeroed the predicted deltas are zero, so the decoded prediction
    is the (nonzero) last observed frame held constant — the undecoded bug
    rendered the raw near-zero deltas as absolute positions."""
    import jax
    import numpy as np

    from motionmixerconv_tpu.cli._runner import build_conv_mixer
    from motionmixerconv_tpu.cli.train_mixer_h36m import parse_args
    from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
    from motionmixerconv_tpu.train import make_optimizer, save_checkpoint
    from motionmixerconv_tpu.train.loop import Trainer
    from motionmixerconv_tpu.viz.live import predict_windows

    data_dir = str(tmp_path / "data")
    fixtures.make_h36m_corpus(data_dir, actions=["walking"], n_frames=400,
                              seed=5)
    targs = parse_args([
        "--data_dir", data_dir, "--save_path", str(tmp_path),
        "--loss_type", "mpjpe", "--delta_x", "1", "--output_n", "10",
        "--skip_rate", "5", "--num_blocks", "1", "--hidden_dim", "16",
    ])
    model = build_conv_mixer(targs, 66, 66, 10, 10)
    trainer = Trainer(
        model, make_optimizer(lr=1e-3, steps_per_epoch=1),
        loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
        input_n=10, output_n=10, input_scale=1e-3, delta_x=True,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = state.replace(
        params=jax.tree_util.tree_map(lambda p: p * 0.0, state.params))
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, state, epoch=0, meta=vars(targs))

    _, pred = predict_windows(ckpt, data_dir, "walking", "test", n_viz=1)
    used = np.asarray(pred).reshape(1, -1, 96)[:, :, H36M_DIM_USED_XYZ]
    # constant across predicted frames (zero deltas) and anchored at the
    # nonzero last observed pose — not collapsed near the origin
    assert np.max(np.abs(used - used[:, :1])) < 1e-3
    assert np.mean(np.abs(used)) > 10.0


@pytest.mark.slow
def test_live_viewer_end_to_end(tmp_path):
    """Train one tiny epoch through the real runner, then drive the viewer
    CLI headless (--save): per-window GIFs of GT-vs-pred animations."""
    from motionmixerconv_tpu.cli._runner import run_h36m
    from motionmixerconv_tpu.cli.train_mixer_h36m import parse_args
    from motionmixerconv_tpu.viz import live

    data_dir = str(tmp_path / "data")
    fixtures.make_h36m_corpus(data_dir, n_frames=400, seed=3)
    run_dir = str(tmp_path / "run")
    args = parse_args([
        "--data_dir", data_dir, "--save_path", run_dir, "--loss_type",
        "mpjpe", "--n_epochs", "1", "--actions_to_consider", "walking",
        "--num_blocks", "1", "--hidden_dim", "16", "--skip_rate", "5",
    ])
    run_h36m(args)
    ckpts = []
    for root, _, files in os.walk(run_dir):
        ckpts += [os.path.join(root, f) for f in files if f == "model.ckpt"]
    assert ckpts

    out = str(tmp_path / "live")
    live.main([
        "--checkpoint", ckpts[0], "--data_dir", data_dir,
        "--action", "walking", "--n_viz", "1", "--save", out,
        "--num_blocks", "1", "--hidden_dim", "16", "--skip_rate", "5",
    ])
    gifs = [f for f in os.listdir(out) if f.endswith(".gif")]
    assert gifs == ["live_walking_0.gif"]
