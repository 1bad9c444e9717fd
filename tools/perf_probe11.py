"""Re-measure bench.py's h36m_autoreg_b50 config after the rollout unroll.

Reproduces the bench stanza (bench.py:373-385) exactly — per-rep-synced
median over the scanned epoch, FLOPs = single step x trip count — so the
number is directly comparable to BENCH_r02's (scan-based) 1.9k seq/s.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
from motionmixerconv_tpu.models import ConvMixer
from motionmixerconv_tpu.train import make_optimizer
from motionmixerconv_tpu.train.autoreg_trainer import AutoregressiveTrainer

dev = jax.devices()[0]
print("device:", dev.device_kind, flush=True)

rs = np.random.RandomState(0)
frames = jnp.asarray((rs.randn(bench.N_FRAMES, 96) * 300.0).astype(np.float32))
seq_len = bench.INPUT_N + bench.OUTPUT_N
n_windows = bench.N_FRAMES - seq_len
batch, n_batches = 50, 100

ar_model = ConvMixer(**bench.AR_KW)
ar = AutoregressiveTrainer(
    ar_model, make_optimizer(lr=1e-4, steps_per_epoch=100, clip_grad=1.0),
    loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ, input_n=bench.INPUT_N,
    output_n=bench.OUTPUT_N, input_n_model=bench.INPUT_N, output_n_model=5,
    step_window=5,
)

state = ar.init_state(jax.random.PRNGKey(0))
starts1 = jnp.asarray(rs.randint(0, n_windows, batch).astype(np.int32))
w1 = jnp.ones((batch,), jnp.float32)
starts = jnp.asarray(
    rs.randint(0, n_windows, size=(n_batches, batch)).astype(np.int32))
w = jnp.ones((n_batches, batch), jnp.float32)

step_fn = jax.jit(lambda s, f, st, ww: ar._ar_train_impl(s, f, st, ww, False))
epoch_fn = jax.jit(lambda s, f, st, ww: ar._ar_epoch_scan_impl(s, f, st, ww, False))

print("compiling step...", flush=True)
flops_step = bench._flops_of(step_fn, state, frames, starts1, w1)
print("flops/step:", flops_step, flush=True)
print("compiling epoch scan...", flush=True)
t = bench._timed(lambda: epoch_fn(state, frames, starts, w)[1], reps=5)
tput = n_batches * batch / t["median_s"]
flops_per_s = flops_step * n_batches / t["median_s"]
bench._check_ceiling("h36m_autoreg_b50", flops_per_s, dev)
peak = bench.PEAK_FLOPS.get(getattr(dev, "device_kind", ""), None)
print(json.dumps({
    "tput_seq_per_s": tput,
    "per_step_us": t["median_s"] / n_batches * 1e6,
    "mfu": (flops_per_s / peak) if peak else None,
    "timing": t,
}), flush=True)
