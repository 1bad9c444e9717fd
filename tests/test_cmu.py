"""CMU loader parity vs the executed reference (tests/golden/cmu.npz).

Golden provenance (tools/gen_golden.py:golden_cmu): load_data_cmu outputs
from the reference run as-is on a fixture corpus; the 38-joint FK golden from
the reference's generic fkl_torch with _some_variables_cmu. The reference's
load_data_cmu_3d itself cannot execute (undefined expmap2xyz_torch_cmu,
data_utils.py:413), so the xyz variant is pinned as the composition of two
executed-reference behaviors: pinned windowing/stats ∘ pinned FK.
"""

import os

import numpy as np
import pytest

from motionmixerconv_tpu.data import fixtures
from motionmixerconv_tpu.data.cmu import (
    CMU_ACTIONS,
    CMU_JOINT_TO_IGNORE_3D,
    CMUDataset,
    define_actions_cmu,
    expmap2xyz_cmu,
    load_data_cmu,
    load_data_cmu_3d,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "cmu.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cmu"))
    # the exact fixture recipe golden_cmu used (same seed/shape)
    fixtures.make_cmu_corpus(
        d, actions=("basketball", "walking"), n_files=2, n_frames=300, seed=77
    )
    return d


def test_define_actions():
    assert define_actions_cmu("walking") == ["walking"]
    assert define_actions_cmu("all") == list(CMU_ACTIONS)
    with pytest.raises(ValueError):
        define_actions_cmu("flying")


def test_load_data_cmu_train_parity(golden, corpus):
    sampled, ignore, use, mean, std = load_data_cmu(
        corpus, ["basketball", "walking"], 10, 25
    )
    assert sampled.shape == golden["train_sampled"].shape
    np.testing.assert_allclose(sampled, golden["train_sampled"], atol=1e-6)
    np.testing.assert_array_equal(ignore, golden["train_ignore"])
    np.testing.assert_array_equal(use, golden["train_use"])
    np.testing.assert_allclose(mean, golden["train_mean"], atol=1e-6)
    np.testing.assert_allclose(std, golden["train_std"], atol=1e-6)


def test_load_data_cmu_test_parity(golden, corpus):
    sampled, ignore, use, _, _ = load_data_cmu(
        corpus, ["basketball", "walking"], 10, 25,
        data_std=golden["train_std"].copy(),
        data_mean=golden["train_mean"].copy(),
        is_test=True,
    )
    # 2 actions x 2 files x 8 seeded windows
    assert sampled.shape == (32, 35, 117)
    np.testing.assert_allclose(sampled, golden["test_sampled"], atol=1e-6)
    np.testing.assert_array_equal(ignore, golden["test_ignore"])
    np.testing.assert_array_equal(use, golden["test_use"])


def test_cmu_fk_parity(golden):
    xyz = np.asarray(expmap2xyz_cmu(golden["fk_angles"]))
    assert xyz.shape == (64, 38, 3)
    scale = np.abs(golden["fk_xyz"]).max()
    np.testing.assert_allclose(xyz, golden["fk_xyz"], atol=2e-4 * scale)


def test_load_data_cmu_3d_composition(golden, corpus):
    """xyz windows == FK applied to the pinned expmap windows, ignore table
    fixed (data_utils.py:452-455, unsorted x/y/z-block order)."""
    sampled, ignore, use, mean, std = load_data_cmu_3d(
        corpus, ["basketball", "walking"], 10, 25
    )
    exp = golden["train_sampled"]  # (W, 35, 117), reference-pinned
    w, t, _ = exp.shape
    want = np.asarray(expmap2xyz_cmu(exp.reshape(-1, 117))).reshape(w, t, 114)
    assert sampled.shape == (w, t, 114)
    np.testing.assert_allclose(sampled, want, atol=1e-3)

    j = CMU_JOINT_TO_IGNORE_3D
    np.testing.assert_array_equal(
        ignore, np.concatenate((j * 3, j * 3 + 1, j * 3 + 2))
    )
    np.testing.assert_array_equal(use, np.setdiff1d(np.arange(114), ignore))
    # ignored dims forced to mean 0 / std 1
    assert np.all(std[ignore] == 1.0) and np.all(mean[ignore] == 0.0)
    # kept dims carry real statistics of the FK'd corpus
    assert np.all(std[use] > 0)


def test_cmu_dataset_windows_match_dense(corpus):
    ds = CMUDataset(corpus, 10, 25, actions=["basketball"], split=0)
    dense = ds.dense_windows()
    assert len(ds) == dense.shape[0]
    for i in (0, len(ds) // 2, len(ds) - 1):
        np.testing.assert_array_equal(ds[i], dense[i])


def test_cmu_test_split_reseed_quirk(corpus):
    """The reference reseeds its RandomState per FILE (data_utils.py:369-370):
    equal-length files must draw identical window offsets."""
    ds = CMUDataset(corpus, 10, 25, actions=["basketball"], split=2,
                    data_mean=np.zeros(117), data_std=np.ones(117))
    n_per_file = 8
    starts = ds.window_starts
    file_len = 150  # 300 frames / downsample 2
    local0 = starts[:n_per_file]
    local1 = starts[n_per_file:] - file_len
    np.testing.assert_array_equal(local0, local1)


def test_cmu_trainable_end_to_end(corpus):
    """Beyond-reference capability: the CMU corpus drives the standard
    Trainer (the reference defines CMU loaders but never wires them into a
    training path). One scanned epoch + eval on the xyz corpus."""
    import jax
    import jax.numpy as jnp

    from motionmixerconv_tpu.models import MlpMixer
    from motionmixerconv_tpu.train import Trainer, make_optimizer

    ds = CMUDataset(corpus, 10, 10, actions=["basketball"], split=0,
                    mode="xyz")
    dim_used = ds.dimensions_to_use
    model = MlpMixer(
        num_classes=len(dim_used), num_blocks=1, hidden_dim=16,
        tokens_mlp_dim=8, channels_mlp_dim=16, seq_len=10, pred_len=10,
        activation="gelu", regularization=0.0, input_size=len(dim_used),
        r_se=4, use_se=True,
    )
    tr = Trainer(
        model, make_optimizer(lr=1e-3, steps_per_epoch=10),
        loss_type="mpjpe", dim_used=dim_used, input_n=10, output_n=10,
        input_scale=1.0,
    )
    state = tr.init_state(jax.random.PRNGKey(0))
    frames = jnp.asarray(ds.frames)
    state, loss = tr.train_epoch(state, ds, frames, batch_size=32, seed=0)
    assert np.isfinite(loss) and loss > 0
    val = tr.validate(state, ds, frames, batch_size=32)
    assert np.isfinite(val)
