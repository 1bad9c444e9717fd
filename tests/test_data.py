"""Data-pipeline parity tests against reference dataset classes.

The golden fixtures were produced by running the reference torch Dataset
classes over synthetic corpora built by our fixture generators with fixed
seeds (tools/gen_golden.py::golden_datasets); the tests rebuild the same
corpora and compare windows item by item.
"""

import os

import numpy as np
import pytest

from motionmixerconv_tpu.data import (
    AISDataset,
    AMASSDataset,
    H36MDataset,
    batch_starts,
    ewm_mean,
    find_indices_256,
    find_indices_srnn,
    fixtures,
    gather_windows,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_find_indices_bit_parity():
    g = np.load(os.path.join(GOLDEN, "find_indices.npz"))
    i1, i2 = find_indices_256(1500, 1700, 35, input_n=10)
    np.testing.assert_array_equal(i1, g["i256_1"])
    np.testing.assert_array_equal(i2, g["i256_2"])
    s1, s2 = find_indices_srnn(1500, 1700, 35, input_n=10)
    np.testing.assert_array_equal(s1, g["isrnn_1"])
    np.testing.assert_array_equal(s2, g["isrnn_2"])


@pytest.fixture(scope="module")
def h36m_dir(tmp_path_factory):
    td = tmp_path_factory.mktemp("h36m")
    fixtures.make_h36m_corpus(
        str(td), actions=["walking", "eating"], n_frames=400, seed=123
    )
    return str(td)


class TestH36M:
    @pytest.mark.parametrize("split", [0, 1, 2])
    def test_xyz_parity(self, h36m_dir, split):
        g = np.load(os.path.join(GOLDEN, "dataset_h36m.npz"))
        ds = H36MDataset(h36m_dir, 10, 25, 5, actions=["walking", "eating"], split=split)
        assert len(ds) == g[f"xyz{split}_len"]
        for j, i in enumerate(g[f"xyz{split}_idxs"]):
            np.testing.assert_allclose(
                ds[int(i)], g[f"xyz{split}_items"][j], atol=2e-3
            )

    @pytest.mark.parametrize("split", [0, 1, 2])
    def test_angle_parity(self, h36m_dir, split):
        g = np.load(os.path.join(GOLDEN, "dataset_h36m.npz"))
        ds = H36MDataset(
            h36m_dir, 10, 25, 5, actions=["walking", "eating"], split=split, mode="angle"
        )
        assert len(ds) == g[f"ang{split}_len"]
        for j, i in enumerate(g[f"ang{split}_idxs"]):
            np.testing.assert_allclose(
                ds[int(i)], g[f"ang{split}_items"][j], atol=1e-5
            )

    def test_dimensions_to_use(self, h36m_dir):
        g = np.load(os.path.join(GOLDEN, "dataset_h36m.npz"))
        ds = H36MDataset(h36m_dir, 10, 25, 5, actions=["walking"], split=0)
        np.testing.assert_array_equal(ds.dimensions_to_use, g["xyz_dims_to_use"])


class TestAIS:
    def test_parity(self, tmp_path):
        fixtures.make_ais_corpus(
            str(tmp_path), actions=["actA", "actB"], n_frames=120,
            fail_frames=(7, 30), seed=5,
        )
        g = np.load(os.path.join(GOLDEN, "dataset_ais.npz"))
        ds = AISDataset(
            str(tmp_path), 10, 10, 2, ["actA", "actB"], smoothing_alpha=0.15
        )
        assert len(ds) == g["length"]
        for j, i in enumerate(g["idxs"]):
            np.testing.assert_allclose(ds[int(i)], g["items"][j], atol=1e-5)

    def test_smoothed_action_matches_pandas(self, tmp_path):
        fixtures.make_ais_corpus(
            str(tmp_path), actions=["actA", "actB"], n_frames=120,
            fail_frames=(7, 30), seed=5,
        )
        g = np.load(os.path.join(GOLDEN, "dataset_ais.npz"))
        ds = AISDataset(
            str(tmp_path), 10, 10, 2, ["actA", "actB"], smoothing_alpha=0.15
        )
        T = g["actA"].shape[0]
        mine = ds.frames[:T]
        ref = g["actA"]
        mask = ~np.isnan(ref)
        np.testing.assert_allclose(mine[mask], ref[mask], atol=1e-5)

    def test_ewm_matches_pandas(self):
        import pandas as pd

        rs = np.random.RandomState(0)
        x = rs.randn(50, 4).astype(np.float32)
        x[3, :] = np.nan
        x[10, 2] = np.nan
        want = pd.DataFrame(x).ewm(alpha=0.2, ignore_na=False).mean().values
        got = ewm_mean(x, 0.2)
        mask = ~np.isnan(want)
        np.testing.assert_allclose(got[mask], want[mask], atol=1e-6)


class TestAMASS:
    def test_pipeline_structure(self, tmp_path):
        fixtures.make_amass_corpus(str(tmp_path), n_frames=300, frame_rate=50.0, seed=3)
        ds = AMASSDataset(str(tmp_path), 10, 25, 5, split=0)
        assert len(ds) > 0
        item = ds[0]
        assert item.shape == (35, 52, 3)
        # 50 fps -> 25 fps: 300 raw frames -> 150 resampled per file
        assert ds.frames.shape[1] == 156

    def test_val_test_splits(self, tmp_path):
        fixtures.make_amass_corpus(str(tmp_path), n_frames=300, seed=3)
        for split in (1, 2):
            ds = AMASSDataset(str(tmp_path), 10, 25, 5, split=split)
            assert len(ds) > 0


def test_gather_and_batch_iteration(h36m_dir):
    import jax.numpy as jnp

    ds = H36MDataset(h36m_dir, 10, 10, 5, actions=["walking"], split=0)
    frames = jnp.asarray(ds.frames)
    seen = 0
    for starts, w in batch_starts(ds, 32, shuffle=True, seed=0):
        assert starts.shape == (32,)
        batch = gather_windows(frames, jnp.asarray(starts), ds.seq_len)
        assert batch.shape == (32, 20, 96)
        seen += int(w.sum())
    assert seen == len(ds)


def test_gather_impls_equivalent(monkeypatch):
    """The take (row-gather) and dslice (block-slice) formulations of
    gather_windows return identical windows, under jit and in a scan."""
    import jax
    import jax.numpy as jnp

    frames = jnp.asarray(
        np.random.RandomState(0).randn(200, 96).astype(np.float32))
    starts = jnp.asarray([0, 5, 165, 17], dtype=jnp.int32)  # 165 = N - T

    outs = {}
    for impl in ("take", "dslice"):
        monkeypatch.setenv("MMC_GATHER_IMPL", impl)
        outs[impl] = jax.jit(
            lambda f, s: gather_windows(f, s, 35))(frames, starts)
    np.testing.assert_array_equal(np.asarray(outs["take"]),
                                  np.asarray(outs["dslice"]))


class TestAMASSParity:
    """Item-level parity against the reference Datasets class, executed over
    the same synthetic corpus with its hardcoded paths IO-redirected
    (tools/gen_golden.py::golden_amass_dataset)."""

    @pytest.mark.parametrize("split", [0, 1, 2])
    def test_items_match_reference(self, tmp_path, split):
        fixtures.make_amass_corpus(str(tmp_path), n_frames=300, frame_rate=50.0, seed=3)
        g = np.load(os.path.join(GOLDEN, "dataset_amass.npz"))
        ds = AMASSDataset(str(tmp_path), 10, 25, 5, split=split)
        assert len(ds) == g[f"s{split}_len"]
        for j, i in enumerate(g[f"s{split}_idxs"]):
            np.testing.assert_allclose(
                ds[int(i)], g[f"s{split}_items"][j], atol=1e-5
            )
