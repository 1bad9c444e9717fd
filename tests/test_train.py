"""End-to-end training tests: optimization, eval parity, checkpointing,
autoregressive rollout parity, and data-parallel equivalence."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionmixerconv_tpu.data import H36MDataset, fixtures
from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
from motionmixerconv_tpu.models import ConvMixer, MlpMixer, convert_conv_mixer
from motionmixerconv_tpu.train import (
    Trainer,
    autoregressive_rollout,
    make_optimizer,
    restore_checkpoint,
    save_checkpoint,
)
from motionmixerconv_tpu.train.loop import _per_sample_mpjpe

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def h36m_dir(tmp_path_factory):
    td = tmp_path_factory.mktemp("h36m_train")
    fixtures.make_h36m_corpus(str(td), actions=["walking"], n_frames=400, seed=7)
    return str(td)


def _small_model():
    return MlpMixer(
        num_classes=66, num_blocks=2, hidden_dim=32, tokens_mlp_dim=16,
        channels_mlp_dim=32, seq_len=10, pred_len=10, activation="gelu",
        regularization=0.1, input_size=66, r_se=4, use_se=True,
    )


def _trainer(mesh=None, steps_per_epoch=10):
    opt = make_optimizer(
        lr=1e-3, use_scheduler=True, milestones=[15, 25], gamma=0.1,
        steps_per_epoch=steps_per_epoch,
    )
    return Trainer(
        _small_model(), opt, loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
        input_n=10, output_n=10, input_scale=1e-3, mesh=mesh,
    )


class TestTrainingLoop:
    def test_loss_decreases(self, h36m_dir):
        ds = H36MDataset(h36m_dir, 10, 10, 5, actions=["walking"], split=0)
        frames = jnp.asarray(ds.frames)
        tr = _trainer()
        state = tr.init_state(jax.random.PRNGKey(0))
        state, first = tr.train_epoch(state, ds, frames, 32, seed=0)
        for ep in range(4):
            state, last = tr.train_epoch(state, ds, frames, 32, seed=ep + 1)
        assert last < first

    def test_val_and_test_metrics_run(self, h36m_dir):
        ds = H36MDataset(h36m_dir, 10, 10, 5, actions=["walking"], split=0)
        test_ds = H36MDataset(h36m_dir, 10, 10, 5, actions=["walking"], split=2)
        frames = jnp.asarray(ds.frames)
        tframes = jnp.asarray(test_ds.frames)
        tr = _trainer()
        state = tr.init_state(jax.random.PRNGKey(0))
        val = tr.evaluate(state, ds, frames, 64, kind="val")
        assert np.isfinite(val)
        mpjpe, auc = tr.evaluate(state, test_ds, tframes, 64, kind="h36m_xyz")
        assert np.isfinite(mpjpe) and 0.0 <= auc <= 1.0

    def test_checkpoint_roundtrip(self, h36m_dir, tmp_path):
        ds = H36MDataset(h36m_dir, 10, 10, 5, actions=["walking"], split=0)
        frames = jnp.asarray(ds.frames)
        tr = _trainer()
        state = tr.init_state(jax.random.PRNGKey(0))
        state, _ = tr.train_epoch(state, ds, frames, 32, seed=0)
        path = str(tmp_path / "ckpt.msgpack")
        save_checkpoint(path, state, epoch=1)
        template = tr.init_state(jax.random.PRNGKey(1))
        restored, epoch = restore_checkpoint(path, template)
        assert epoch == 1
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(a, b)
        # training continues identically from the restored state
        s1, l1 = tr.train_epoch(state, ds, frames, 32, seed=9)
        s2, l2 = tr.train_epoch(restored, ds, frames, 32, seed=9)
        assert l1 == pytest.approx(l2, rel=1e-6)

    def test_checkpoint_rewrite_never_served_stale(self, h36m_dir, tmp_path):
        """save_checkpoint must drop the one-entry read cache: a same-size
        rewrite inside the filesystem's mtime granularity collides with the
        old (path, mtime_ns, size) key and would serve the PREVIOUS epoch's
        payload (in-process save->load cycles, e.g. a per-epoch drift
        callback). The mtime collision is forced with os.utime."""
        import os

        ds = H36MDataset(h36m_dir, 10, 10, 5, actions=["walking"], split=0)
        frames = jnp.asarray(ds.frames)
        tr = _trainer()
        state = tr.init_state(jax.random.PRNGKey(0))
        path = str(tmp_path / "ckpt.msgpack")
        save_checkpoint(path, state, epoch=1)
        template = tr.init_state(jax.random.PRNGKey(1))
        _, epoch = restore_checkpoint(path, template)  # warm the cache
        assert epoch == 1
        st = os.stat(path)
        state, _ = tr.train_epoch(state, ds, frames, 32, seed=0)
        save_checkpoint(path, state, epoch=2)
        # force the worst case: identical size + identical mtime_ns
        assert os.stat(path).st_size == st.st_size
        os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns))
        restored, epoch = restore_checkpoint(path, template)
        assert epoch == 2
        np.testing.assert_array_equal(
            jax.tree_util.tree_leaves(state.params)[0],
            jax.tree_util.tree_leaves(restored.params)[0])

    def test_prefetch_epoch_equivalence(self, h36m_dir):
        """The prefetch-pipelined epoch scan (gather for step i+1 issued
        during step i's compute) is numerically identical to the plain scan:
        same windows, same order, same math — params and loss match."""
        ds = H36MDataset(h36m_dir, 10, 10, 5, actions=["walking"], split=0)
        frames = jnp.asarray(ds.frames)
        tr = _trainer()
        n_windows = frames.shape[0] - tr.input_n - tr.output_n
        rs = np.random.RandomState(0)
        starts = jnp.asarray(
            rs.randint(0, n_windows, (5, 16)).astype(np.int32))
        w = jnp.ones((5, 16), jnp.float32)

        s0 = tr.init_state(jax.random.PRNGKey(0))
        s1 = tr.init_state(jax.random.PRNGKey(0))
        plain_s, plain_l = jax.jit(tr._train_epoch_scan_impl)(
            s0, frames, starts, w)
        pf_s, pf_l = jax.jit(tr._train_epoch_scan_prefetch_impl)(
            s1, frames, starts, w)
        assert float(plain_l) == pytest.approx(float(pf_l), rel=1e-6)
        assert int(pf_s.step) == int(plain_s.step)
        for a, b in zip(jax.tree_util.tree_leaves(plain_s.params),
                        jax.tree_util.tree_leaves(pf_s.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_data_parallel_equivalence(self, h36m_dir):
        """Sharded batches over an 8-device CPU mesh == single-device run."""
        from motionmixerconv_tpu.parallel import make_mesh

        ds = H36MDataset(h36m_dir, 10, 10, 5, actions=["walking"], split=0)
        frames = jnp.asarray(ds.frames)

        tr0 = _trainer()
        st0 = tr0.init_state(jax.random.PRNGKey(0))

        mesh = make_mesh()
        trm = _trainer(mesh=mesh)
        stm = trm.init_state(jax.random.PRNGKey(0))

        st0, l0 = tr0.train_epoch(st0, ds, frames, 32, seed=0)
        stm, lm = trm.train_epoch(stm, ds, frames, 32, seed=0)
        assert l0 == pytest.approx(lm, rel=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(st0.params),
            jax.tree_util.tree_leaves(stm.params),
        ):
            np.testing.assert_allclose(a, b, atol=1e-5)


class TestAutoregressiveParity:
    @pytest.fixture()
    def setup(self):
        data = np.load(os.path.join(GOLDEN, "autoregressive.npz"))
        sd = {k[4:]: data[k] for k in data.files if k.startswith("sd::")}
        model = ConvMixer(
            num_blocks=1, dimPosIn=66, dimPosEmb=30, dimPosOut=66, in_nTP=10,
            out_nTP=5, conv_nChan=1, conv1_kernel_shape=(1, 3),
            conv1_padding=None, mode_conv="twice", activation="gelu",
            regularization=0.0, use_se=True, r_se=2,
            encoder_n_harmonic_functions=8, encoder_omega0=0.1,
        )
        variables = convert_conv_mixer(sd, num_blocks=1)
        apply_fn = lambda x: model.apply(variables, x, training=False)
        batch = jnp.asarray(data["batch"])
        seq = jnp.take(batch, jnp.asarray(data["dim_used"]), axis=2)
        return data, apply_fn, seq

    def test_teacher_forcing(self, setup):
        data, apply_fn, seq = setup
        per_sample, pred = autoregressive_rollout(
            apply_fn, seq, input_n_model=10, output_n_model=5, step_window=5,
            teacher_forcing=True, loss_per_sample=_per_sample_mpjpe,
        )
        np.testing.assert_allclose(jnp.mean(per_sample), data["loss_tf"][0], atol=1e-4)
        np.testing.assert_allclose(pred, data["pred_tf"], atol=1e-4)

    def test_closed_loop(self, setup):
        data, apply_fn, seq = setup
        per_sample, pred = autoregressive_rollout(
            apply_fn, seq, input_n_model=10, output_n_model=5, step_window=5,
            teacher_forcing=False, loss_per_sample=_per_sample_mpjpe,
        )
        np.testing.assert_allclose(jnp.mean(per_sample), data["loss_cl"][0], atol=1e-4)
        np.testing.assert_allclose(pred, data["pred_cl"], atol=1e-4)

    def test_gradients_flow_through_rollout(self, setup):
        data, _, seq = setup
        sd = {k[4:]: data[k] for k in data.files if k.startswith("sd::")}
        model = ConvMixer(
            num_blocks=1, dimPosIn=66, dimPosEmb=30, dimPosOut=66, in_nTP=10,
            out_nTP=5, conv_nChan=1, conv1_kernel_shape=(1, 3),
            conv1_padding=None, mode_conv="twice", activation="gelu",
            regularization=0.0, use_se=True, r_se=2,
            encoder_n_harmonic_functions=8, encoder_omega0=0.1,
        )
        variables = convert_conv_mixer(sd, num_blocks=1)

        def loss_fn(params):
            apply_fn = lambda x: model.apply({"params": params}, x, training=False)
            per_sample, _ = autoregressive_rollout(
                apply_fn, seq, input_n_model=10, output_n_model=5,
                step_window=5, teacher_forcing=False,
                loss_per_sample=_per_sample_mpjpe,
            )
            return jnp.mean(per_sample)

        grads = jax.grad(loss_fn)(variables["params"])
        norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
        assert all(np.isfinite(n) for n in norms)
        assert any(n > 0 for n in norms)


def test_data_parallel_grouped_eval(h36m_dir):
    """Sharded grouped eval matches single-device grouped eval."""
    import numpy as np
    from motionmixerconv_tpu.parallel import make_mesh

    ds = H36MDataset(h36m_dir, 10, 10, 5, actions=["walking"], split=2)
    frames = jnp.asarray(ds.frames)
    gids = np.zeros(len(ds), np.int64)

    tr0 = _trainer()
    st0 = tr0.init_state(jax.random.PRNGKey(0))
    m1a, m2a, na = tr0.evaluate_grouped(
        st0, frames, ds.window_starts, gids, 1, 64, "h36m_xyz"
    )

    mesh = make_mesh()
    trm = _trainer(mesh=mesh)
    stm = trm.init_state(jax.random.PRNGKey(0))
    m1b, m2b, nb = trm.evaluate_grouped(
        stm, frames, ds.window_starts, gids, 1, 64, "h36m_xyz"
    )
    np.testing.assert_allclose(m1a, m1b, rtol=1e-5)
    np.testing.assert_allclose(m2a, m2b, rtol=1e-5)
    np.testing.assert_array_equal(na, nb)


def _small_ar_trainer(mesh=None):
    from motionmixerconv_tpu.train.autoreg_trainer import AutoregressiveTrainer

    model = ConvMixer(
        num_blocks=1, dimPosIn=66, dimPosEmb=24, dimPosOut=66, in_nTP=10,
        out_nTP=5, conv_nChan=1, conv1_kernel_shape=(1, 3), mode_conv="twice",
        activation="gelu", regularization=0.0, use_se=True, r_se=2,
        encoder_n_harmonic_functions=0,
    )
    return AutoregressiveTrainer(
        model, make_optimizer(lr=1e-3, steps_per_epoch=5),
        loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
        input_n=10, output_n=25, input_n_model=10, output_n_model=5,
        step_window=5, mesh=mesh,
    )


def test_autoregressive_data_parallel_equivalence(h36m_dir):
    """AR scan-epoch training + scanned rollout eval sharded over an 8-device
    mesh match the single-device run (VERDICT r1 weak #2)."""
    from motionmixerconv_tpu.parallel import make_mesh

    ds = H36MDataset(h36m_dir, 10, 25, 5, actions=["walking"], split=0)
    frames = jnp.asarray(ds.frames)

    tr0 = _small_ar_trainer()
    st0 = tr0.init_state(jax.random.PRNGKey(0))
    st0, l0 = tr0.train_epoch_ar(st0, ds, frames, 16, seed=0, teacher_forcing=False)

    mesh = make_mesh()
    trm = _small_ar_trainer(mesh=mesh)
    stm = trm.init_state(jax.random.PRNGKey(0))
    stm, lm = trm.train_epoch_ar(stm, ds, frames, 16, seed=0, teacher_forcing=False)

    assert l0 == pytest.approx(lm, rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(st0.params),
        jax.tree_util.tree_leaves(stm.params),
    ):
        np.testing.assert_allclose(a, b, atol=1e-5)

    # scanned rollout eval matches across the mesh too (val + test kinds)
    v0 = tr0.evaluate_ar(st0, ds, frames, 16, kind="val")
    vm = trm.evaluate_ar(stm, ds, frames, 16, kind="val")
    assert v0 == pytest.approx(vm, rel=1e-5)
    t0_loss, t0_metric = tr0.evaluate_ar(st0, ds, frames, 16, kind="test")
    tm_loss, tm_metric = trm.evaluate_ar(stm, ds, frames, 16, kind="test")
    assert t0_loss == pytest.approx(tm_loss, rel=1e-5)
    assert t0_metric == pytest.approx(tm_metric, rel=1e-5)


def test_autoregressive_batchnorm_training(h36m_dir):
    """regularization=-1 (BatchNorm) trains through the rollout and stats move."""
    from motionmixerconv_tpu.models import ConvMixer
    from motionmixerconv_tpu.train.autoreg_trainer import AutoregressiveTrainer

    ds = H36MDataset(h36m_dir, 10, 25, 5, actions=["walking"], split=0)
    frames = jnp.asarray(ds.frames)
    model = ConvMixer(
        num_blocks=1, dimPosIn=66, dimPosEmb=24, dimPosOut=66, in_nTP=10,
        out_nTP=5, conv_nChan=1, conv1_kernel_shape=(1, 3), mode_conv="twice",
        activation="gelu", regularization=-1.0, use_se=True, r_se=2,
        encoder_n_harmonic_functions=0,
    )
    tr = AutoregressiveTrainer(
        model, make_optimizer(lr=1e-3, steps_per_epoch=5),
        loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
        input_n=10, output_n=25, input_n_model=10, output_n_model=5,
        step_window=5,
    )
    state = tr.init_state(jax.random.PRNGKey(0))
    bs_before = [np.array(x) for x in jax.tree_util.tree_leaves(state.batch_stats)]
    assert bs_before, "model should have batch_stats"
    for tf in (True, False):
        state, loss = tr.train_epoch_ar(state, ds, frames, 16, seed=0,
                                        teacher_forcing=tf)
        assert np.isfinite(loss)
    bs_after = [np.array(x) for x in jax.tree_util.tree_leaves(state.batch_stats)]
    assert any(
        not np.allclose(a, b) for a, b in zip(bs_before, bs_after)
    ), "running stats never updated"


def test_direct_trainer_batchnorm_training(h36m_dir):
    """regularization=-1 MlpMixer (a value the MLP study samples) trains and
    updates running stats through the scan-epoch path."""
    ds = H36MDataset(h36m_dir, 10, 10, 5, actions=["walking"], split=0)
    frames = jnp.asarray(ds.frames)
    model = MlpMixer(
        num_classes=66, num_blocks=1, hidden_dim=24, tokens_mlp_dim=8,
        channels_mlp_dim=24, seq_len=10, pred_len=10, activation="gelu",
        regularization=-1.0, input_size=66, r_se=4, use_se=True,
    )
    tr = Trainer(
        model, make_optimizer(lr=1e-3, steps_per_epoch=5),
        loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
        input_n=10, output_n=10, input_scale=1e-3,
    )
    state = tr.init_state(jax.random.PRNGKey(0))
    bs_before = [np.array(x) for x in jax.tree_util.tree_leaves(state.batch_stats)]
    assert bs_before
    state, loss = tr.train_epoch(state, ds, frames, 32, seed=0)
    assert np.isfinite(loss)
    bs_after = [np.array(x) for x in jax.tree_util.tree_leaves(state.batch_stats)]
    assert any(not np.allclose(a, b) for a, b in zip(bs_before, bs_after))
    # eval uses the running stats without error
    val = tr.validate(state, ds, frames, 64)
    assert np.isfinite(val)


def test_mesh_grouped_eval_small_corpus(h36m_dir):
    """A corpus smaller than batch_size (with a count NOT divisible by the
    mesh's data axis) must still evaluate under a mesh: bs rounds up to a
    multiple of the axis and weight-0 padding absorbs the extra rows.
    Regression: min(batch_size, n) produced an unshardable (n_batches, n)
    array and device_put raised."""
    import numpy as np
    from motionmixerconv_tpu.parallel import make_mesh

    ds = H36MDataset(h36m_dir, 10, 10, 5, actions=["walking"], split=2)
    frames = jnp.asarray(ds.frames)
    n = 13  # < batch_size, not divisible by the 8-device axis
    starts = ds.window_starts[:n]
    gids = np.zeros(n, np.int64)

    tr0 = _trainer()
    st0 = tr0.init_state(jax.random.PRNGKey(0))
    m1a, m2a, na = tr0.evaluate_grouped(st0, frames, starts, gids, 1, 64,
                                        "h36m_xyz")

    trm = _trainer(mesh=make_mesh())
    stm = trm.init_state(jax.random.PRNGKey(0))
    m1b, m2b, nb = trm.evaluate_grouped(stm, frames, starts, gids, 1, 64,
                                        "h36m_xyz")
    np.testing.assert_allclose(m1a, m1b, rtol=1e-5)
    np.testing.assert_allclose(m2a, m2b, rtol=1e-5)
    np.testing.assert_array_equal(na, nb)
    assert float(na[0]) == n


class TestLongRolloutScanFallback:
    """Closed-loop rollouts longer than UNROLL_MAX_STEPS fall back to
    lax.scan; the scan path must match the unrolled chain (values AND
    gradients) bit-for-float."""

    @staticmethod
    def _run(w):
        # tiny linear "model": pred = mean of the window scaled by w
        def apply_fn(x):  # (B, 4, D) -> (B, 2, D)
            return jnp.stack([x[:, -1] * w, x[:, -2] * w], axis=1)

        rs = np.random.RandomState(3)
        seq = jnp.asarray(rs.randn(5, 4 + 20, 6).astype(np.float32))
        per_sample, pred = autoregressive_rollout(
            apply_fn, seq, input_n_model=4, output_n_model=2, step_window=2,
            teacher_forcing=False, loss_per_sample=_per_sample_mpjpe,
        )
        return per_sample, pred

    def test_scan_matches_unrolled(self, monkeypatch):
        from motionmixerconv_tpu.train import autoregressive as ar_mod

        # n_steps = 20 // 2 = 10 > UNROLL_MAX_STEPS=8 -> default is scan
        assert 10 > ar_mod.UNROLL_MAX_STEPS
        loss_scan, pred_scan = self._run(jnp.float32(0.9))
        g_scan = jax.grad(lambda w: jnp.mean(self._run(w)[0]))(
            jnp.float32(0.9))

        monkeypatch.setattr(ar_mod, "UNROLL_MAX_STEPS", 100)
        loss_unr, pred_unr = self._run(jnp.float32(0.9))
        g_unr = jax.grad(lambda w: jnp.mean(self._run(w)[0]))(
            jnp.float32(0.9))

        np.testing.assert_allclose(loss_scan, loss_unr, rtol=1e-6)
        np.testing.assert_allclose(pred_scan, pred_unr, rtol=1e-6)
        assert pred_scan.shape == (5, 10 * 2, 6)
        np.testing.assert_allclose(g_scan, g_unr, rtol=1e-5)
