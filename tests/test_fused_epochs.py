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


def test_eval_stack_cache_keyed_on_content():
    """The fused path's device-resident eval-stack cache must key on window
    CONTENT: an equal-length but different val set gets fresh stacks (an
    id()-keyed cache could stale-hit after GC recycles ids — ADVICE r3),
    while an equal-content copy still hits."""
    seq_len = IN_N + OUT_N
    frames = _frames(500, 0)
    corpus = _corpus(frames, 60, 1, seq_len)
    vald1 = _corpus(frames, 40, 2, seq_len)
    vald2 = _corpus(frames, 40, 9, seq_len)  # same length, different starts
    test_starts = np.asarray(_corpus(frames, 60, 3, seq_len).window_starts)
    test_gids = np.repeat(np.arange(3), 20)

    tr = _conv_trainer()

    def run(vald):
        st = tr.init_state(jax.random.PRNGKey(7))
        _, out = tr.run_epochs_fused(
            st, corpus, frames, 32, [0], vald, frames,
            frames, test_starts, test_gids, 3, "simple", 32)
        return out

    out1 = run(vald1)
    k1 = tr._fused_eval_stacks[0]
    del vald1  # allow id reuse — the stale-hit precondition
    out2 = run(vald2)
    k2 = tr._fused_eval_stacks[0]
    assert k1 != k2  # different content -> cache miss
    assert not np.allclose(out1["val"], out2["val"])

    # ground truth from a cache-free trainer: vald2 really was evaluated
    tr_f = _conv_trainer()
    st_f = tr_f.init_state(jax.random.PRNGKey(7))
    _, out_f = tr_f.run_epochs_fused(
        st_f, corpus, frames, 32, [0], vald2, frames,
        frames, test_starts, test_gids, 3, "simple", 32)
    np.testing.assert_allclose(out2["val"], out_f["val"], rtol=1e-6)

    # equal CONTENT in a fresh object still hits the cache
    vald2_copy = WindowedCorpus(frames=frames,
                                window_starts=vald2.window_starts.copy(),
                                seq_len=seq_len)
    run(vald2_copy)
    assert tr._fused_eval_stacks[0] == k2


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


class TestChunkEpochs:
    """_chunk_epochs sizing: cover [start, stop) exactly, never straddle the
    TF boundary, and bound the number of distinct chunk lengths (each
    distinct length is a separate remote compile)."""

    @staticmethod
    def _chunks(*a, **k):
        from motionmixerconv_tpu.cli._runner import _chunk_epochs
        return [list(c) for c in _chunk_epochs(*a, **k)]

    def test_exact_division(self):
        assert self._chunks(0, 12, 4) == [[0, 1, 2, 3], [4, 5, 6, 7],
                                          [8, 9, 10, 11]]

    def test_divisor_preferred_over_remainder(self):
        # 10 % 4 != 0 but 2 divides 10 and 2 >= ceil(4/2): one compiled
        # shape (5 chunks of 2) instead of 4+4+2 (two shapes).
        chunks = self._chunks(0, 10, 4)
        assert [len(c) for c in chunks] == [2] * 5

    def test_balanced_fallback_for_prime_length(self):
        # 7 has no divisor in [2, 4] -> two near-equal chunks (4, 3), never
        # a lopsided 4+3 vs 4+2+1 tail.
        chunks = self._chunks(0, 7, 4)
        assert [len(c) for c in chunks] == [4, 3]

    def test_tf_boundary_never_straddled(self):
        chunks = self._chunks(0, 10, 4, 3)
        flat = [e for c in chunks for e in c]
        assert flat == list(range(10))
        for c in chunks:
            assert all(e < 3 for e in c) or all(e >= 3 for e in c)

    def test_coverage_exhaustive(self):
        for stop in range(1, 23):
            for epd in range(1, 9):
                for tf in (None, 1, stop // 2, stop):
                    chunks = self._chunks(0, stop, epd, tf)
                    flat = [e for c in chunks for e in c]
                    assert flat == list(range(stop)), (stop, epd, tf)
                    assert all(len(c) <= epd for c in chunks)
                    # at most two distinct lengths per boundary segment
                    if tf is None or not (0 < tf < stop):
                        assert len({len(c) for c in chunks}) <= 2


class TestRunFusedChunksNanGuard:
    """With nan_guard, a chunk whose train losses go non-finite still logs
    its finite prefix before raising (autoreg_trainer.py NaN guardrail)."""

    def test_finite_prefix_logged_then_raises(self):
        from types import SimpleNamespace
        from motionmixerconv_tpu.cli._runner import _run_fused_chunks

        logged, saved = [], []

        class FakeTrainer:
            def run_epochs_fused(self, state, dataset, frames, bs, epochs,
                                 *a, **k):
                # chunk [0,1]: finite; chunk [2,3]: epoch 2 finite, 3 NaN
                train = np.array(
                    [1.0 if e < 3 else np.nan for e in epochs])
                out = {"train": train,
                       "val": np.zeros(len(epochs)),
                       "m1": np.ones((len(epochs), 1)),
                       "m2": np.ones((len(epochs), 1)),
                       "n": np.ones((len(epochs), 1))}
                return state + 1, out

        args = SimpleNamespace(n_epochs=4, batch_size=8)
        with pytest.raises(FloatingPointError, match="epoch 3"):
            _run_fused_chunks(
                args, FakeTrainer(), 0, 2,
                dataset=[0] * 16, frames=None, vald=None, vframes=None,
                test_frames=None, test_starts=None, test_gids=None,
                n_groups=1, test_kind="simple", batch_size_test=8,
                start_epoch=0, tf_boundary=None, nan_guard=True,
                log_epoch=lambda epoch, i, out, *a: logged.append(epoch),
                save_chunk=lambda st, last: saved.append(last),
            )
        # epochs 0,1 (chunk 1) and the finite epoch 2 of chunk 2 are logged;
        # only chunk 1 reached its checkpoint.
        assert logged == [0, 1, 2]
        assert saved == [1]
