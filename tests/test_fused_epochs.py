"""--epochs_per_dispatch: fused multi-epoch scan equivalence.

The fused path (Trainer.run_epochs_fused) must reproduce the default
per-epoch path's history exactly: same train-loss trajectory, same val/test
metrics per epoch, same final parameters. It composes the very same phase
impls (_train_epoch_scan_impl, _val_per_sample, the grouped segment sums)
inside one lax.scan over epochs, so agreement is expected to float-noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from motionmixerconv_tpu.data.windows import WindowedCorpus
from motionmixerconv_tpu.models import ConvMixer
from motionmixerconv_tpu.train import Trainer, make_optimizer
from motionmixerconv_tpu.train.autoreg_trainer import AutoregressiveTrainer

DIM_USED = np.arange(6, 6 + 18)  # 18 dims = 6 fake joints
IN_N, OUT_N = 10, 10


def _frames(n, seed):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.randn(n, 30).astype(np.float32) * 100.0)


def _corpus(frames, n_windows, seed, seq_len):
    rs = np.random.RandomState(seed)
    starts = rs.randint(0, frames.shape[0] - seq_len, n_windows).astype(np.int64)
    return WindowedCorpus(frames=frames, window_starts=starts, seq_len=seq_len)


def _conv_trainer(out_ntp=OUT_N, cls=Trainer, **extra):
    model = ConvMixer(
        num_blocks=2, dimPosIn=18, dimPosEmb=16, dimPosOut=18,
        in_nTP=IN_N, out_nTP=out_ntp, conv_nChan=1,
        conv1_kernel_shape=(1, 3), conv1_stride=(1, 1), conv1_padding=(0, 1),
        mode_conv="twice", activation="mish", regularization=0.1,
        use_se=True, r_se=4, use_max_pooling=False,
        encoder_n_harmonic_functions=0, encoder_omega0=0.1,
    )
    opt = make_optimizer(lr=1e-3, steps_per_epoch=10)
    return cls(model, opt, loss_type="mpjpe", dim_used=DIM_USED,
               input_n=IN_N, output_n=OUT_N, input_scale=1e-3, **extra)


def test_direct_fused_matches_per_epoch_loop():
    seq_len = IN_N + OUT_N
    frames = _frames(500, 0)
    corpus = _corpus(frames, 120, 1, seq_len)
    vald = _corpus(frames, 40, 2, seq_len)
    test_starts = np.asarray(_corpus(frames, 60, 3, seq_len).window_starts)
    test_gids = np.repeat(np.arange(3), 20)

    epochs = [0, 1, 2]

    # default per-epoch path
    tr_a = _conv_trainer()
    st_a = tr_a.init_state(jax.random.PRNGKey(7))
    hist_a = {"train": [], "val": [], "m1": [], "m2": [], "n": []}
    for e in epochs:
        st_a, tl = tr_a.train_epoch(st_a, corpus, frames, 32, seed=e)
        hist_a["train"].append(tl)
        hist_a["val"].append(tr_a.validate(st_a, vald, frames, 32))
        m1, m2, nn = tr_a.evaluate_grouped(
            st_a, frames, test_starts, test_gids, 3, 32, "simple")
        hist_a["m1"].append(m1)
        hist_a["m2"].append(m2)
        hist_a["n"].append(nn)

    # fused path (identical init)
    tr_b = _conv_trainer()
    st_b = tr_b.init_state(jax.random.PRNGKey(7))
    st_b, out = tr_b.run_epochs_fused(
        st_b, corpus, frames, 32, epochs, vald, frames,
        frames, test_starts, test_gids, 3, "simple", 32)

    np.testing.assert_allclose(out["train"], hist_a["train"], rtol=1e-5)
    np.testing.assert_allclose(out["val"], hist_a["val"], rtol=1e-5)
    np.testing.assert_allclose(out["m1"], np.stack(hist_a["m1"]), rtol=1e-4)
    np.testing.assert_allclose(out["m2"], np.stack(hist_a["m2"]), rtol=1e-4)
    np.testing.assert_allclose(out["n"], np.stack(hist_a["n"]), rtol=0)

    pa = jax.tree_util.tree_leaves(st_a.params)
    pb = jax.tree_util.tree_leaves(st_b.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_ar_fused_matches_per_epoch_loop():
    """AR fused chunks (one TF, one closed-loop) vs the per-epoch AR path."""
    seq_len = IN_N + OUT_N
    frames = _frames(400, 10)
    corpus = _corpus(frames, 80, 11, seq_len)
    vald = _corpus(frames, 30, 12, seq_len)
    test_starts = np.asarray(_corpus(frames, 30, 13, seq_len).window_starts)
    test_gids = np.zeros(30, np.int64)

    def make():
        tr = _conv_trainer(out_ntp=5, cls=AutoregressiveTrainer,
                           output_n_model=5, input_n_model=IN_N, step_window=5)
        return tr, tr.init_state(jax.random.PRNGKey(21))

    # per-epoch path: epoch 0 teacher-forced, epochs 1-2 closed loop
    tr_a, st_a = make()
    hist_a = {"train": [], "val": [], "test": []}
    for e in range(3):
        st_a, tl = tr_a.train_epoch_ar(st_a, corpus, frames, 32, seed=e,
                                       teacher_forcing=e < 1)
        hist_a["train"].append(tl)
        hist_a["val"].append(tr_a.evaluate_ar(st_a, vald, frames, 32, "val"))
        hist_a["test"].append(
            tr_a.evaluate_ar(st_a, corpus, frames, 32, "test")[0])

    # fused path, chunked at the TF boundary
    tr_b, st_b = make()
    outs = []
    for epochs, tf in (([0], True), ([1, 2], False)):
        st_b, out = tr_b.run_epochs_fused(
            st_b, corpus, frames, 32, epochs, vald, frames,
            frames, np.asarray(corpus.window_starts),
            np.zeros(len(corpus), np.int64), 1, "ar", 32,
            teacher_forcing=tf)
        outs.append(out)
    train_b = np.concatenate([o["train"] for o in outs])
    val_b = np.concatenate([o["val"] for o in outs])
    test_b = np.concatenate(
        [o["m1"][:, 0] / np.maximum(o["n"][:, 0], 1.0) for o in outs])

    np.testing.assert_allclose(train_b, hist_a["train"], rtol=1e-5)
    np.testing.assert_allclose(val_b, hist_a["val"], rtol=1e-5)
    np.testing.assert_allclose(test_b, hist_a["test"], rtol=1e-4)

    for a, b in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_fused_mesh_matches_single_device():
    """run_epochs_fused under an 8-device data-parallel mesh == unsharded."""
    from motionmixerconv_tpu.parallel import make_mesh

    seq_len = IN_N + OUT_N
    frames = _frames(500, 30)
    corpus = _corpus(frames, 96, 31, seq_len)
    vald = _corpus(frames, 40, 32, seq_len)
    test_starts = np.asarray(_corpus(frames, 48, 33, seq_len).window_starts)
    test_gids = np.repeat(np.arange(3), 16)
    epochs = [0, 1]

    results = []
    for mesh in (None, make_mesh()):
        tr = _conv_trainer(mesh=mesh)
        st = tr.init_state(jax.random.PRNGKey(9))
        st, out = tr.run_epochs_fused(
            st, corpus, frames, 32, epochs, vald, frames,
            frames, test_starts, test_gids, 3, "simple", 32)
        results.append((st, out))

    (st_a, out_a), (st_b, out_b) = results
    np.testing.assert_allclose(out_b["train"], out_a["train"], rtol=1e-5)
    np.testing.assert_allclose(out_b["val"], out_a["val"], rtol=1e-5)
    np.testing.assert_allclose(out_b["m1"], out_a["m1"], rtol=1e-4)
    # sharded gradient all-reduce changes float summation order; tolerance =
    # TestDataParallel.test_data_parallel_equivalence's 1e-5 x 2 epochs of
    # drift accumulation
    for a, b in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_direct_trainer_rejects_tf_flag():
    tr = _conv_trainer()
    # the direct trainer ignores teacher_forcing=None; the AR trainer
    # requires an explicit flag
    ar = _conv_trainer(out_ntp=5, cls=AutoregressiveTrainer,
                       output_n_model=5, input_n_model=IN_N, step_window=5)
    with pytest.raises(ValueError):
        ar._epoch_train_impl_for(None)
    assert tr._epoch_train_impl_for(None) == tr._train_epoch_scan_impl


def test_cli_fused_matches_default(tmp_path):
    """run_h36m with --epochs_per_dispatch 2 reproduces the default history."""
    from motionmixerconv_tpu.cli import train_mixer_h36m
    from motionmixerconv_tpu.data import fixtures

    data = str(tmp_path / "data")
    fixtures.make_h36m_corpus(data, n_frames=340, seed=5)
    common = [
        "--data_dir", data, "--loss_type", "mpjpe", "--n_epochs", "3",
        "--skip_rate", "5", "--num_blocks", "2", "--hidden_dim", "24",
        "--actions_to_consider", "walking", "--batch_size", "128",
    ]
    h_def = train_mixer_h36m.main(
        common + ["--save_path", str(tmp_path / "runs_def")])
    h_fused = train_mixer_h36m.main(
        common + ["--save_path", str(tmp_path / "runs_fused"),
                  "--epochs_per_dispatch", "2"])

    np.testing.assert_allclose(h_fused["train"], h_def["train"], rtol=1e-5)
    np.testing.assert_allclose(h_fused["val"], h_def["val"], rtol=1e-5)
    np.testing.assert_allclose(h_fused["test"], h_def["test"], rtol=1e-4)
    for k in h_def["metrics"]:
        np.testing.assert_allclose(h_fused["metrics"][k], h_def["metrics"][k],
                                   rtol=1e-4)
