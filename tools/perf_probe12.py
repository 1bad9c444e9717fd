"""Measure --epochs_per_dispatch on the real TPU at bench.py's full-epoch
config (train 10000 + val 2000 + 15-action test 3840 windows, batch 50):
per-epoch wall time of the default 3-dispatch path vs fused chunks of K
epochs in one dispatch (Trainer.run_epochs_fused)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
from motionmixerconv_tpu.data.windows import WindowedCorpus
from motionmixerconv_tpu.models import ConvMixer
from motionmixerconv_tpu.train import Trainer, make_optimizer

rs = np.random.RandomState(0)
frames = jnp.asarray((rs.randn(bench.N_FRAMES, 96) * 300.0).astype(np.float32))
seq_len = bench.INPUT_N + bench.OUTPUT_N
n_windows = bench.N_FRAMES - seq_len

model = ConvMixer(**bench.CONV_KW)
opt = make_optimizer(lr=1e-3, steps_per_epoch=200)
tr = Trainer(model, opt, loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
             input_n=bench.INPUT_N, output_n=bench.OUTPUT_N, input_scale=1e-3)

corpus = WindowedCorpus(
    frames=frames,
    window_starts=rs.randint(0, n_windows, bench.EPOCH_TRAIN_W).astype(np.int64),
    seq_len=seq_len)
vald = WindowedCorpus(
    frames=frames,
    window_starts=rs.randint(0, n_windows, bench.EPOCH_VAL_W).astype(np.int64),
    seq_len=seq_len)
test_starts = rs.randint(0, n_windows, bench.EPOCH_TEST_W).astype(np.int64)
test_gids = np.repeat(np.arange(15), 256)


def default_epochs(state, epochs):
    for e in epochs:
        state, _ = tr.train_epoch(state, corpus, frames, 50, seed=e, scan=True)
        tr.validate(state, vald, frames, 256)
        tr.evaluate_grouped(state, frames, test_starts, test_gids, 15, 256,
                            "h36m_xyz")
    return state


def fused_epochs(state, epochs, k):
    for i in range(0, len(epochs), k):
        state, out = tr.run_epochs_fused(
            state, corpus, frames, 50, epochs[i:i + k], vald, frames,
            frames, test_starts, test_gids, 15, "h36m_xyz", 256)
        _ = out["train"]  # already host numpy = synced
    return state


K = 10
N_EP = 10

# compile + warm both paths
print("compiling default path...", flush=True)
default_epochs(tr.init_state(jax.random.PRNGKey(0)), range(2))
print("compiling fused path...", flush=True)
fused_epochs(tr.init_state(jax.random.PRNGKey(1)), list(range(N_EP)), K)

for name, fn in (("default", lambda s: default_epochs(s, range(N_EP))),
                 ("fused_k10", lambda s: fused_epochs(s, list(range(N_EP)), K))):
    ts = []
    for rep in range(3):
        state = tr.init_state(jax.random.PRNGKey(10 + rep))
        t0 = time.perf_counter()
        fn(state)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"{name}: {med:.3f} s / {N_EP} epochs = {med / N_EP * 1e3:.1f} ms/epoch"
          f"  (min {min(ts):.3f} max {max(ts):.3f})", flush=True)
