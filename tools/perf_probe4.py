"""Probe 4: fused harmonic-encoder kernel vs plain XLA, in the production
scan-epoch shape (per-rep-synced medians). Writes /tmp/perf_probe4.json."""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
from motionmixerconv_tpu.models import ConvMixer
from motionmixerconv_tpu.train import Trainer, make_optimizer

INPUT_N, OUTPUT_N = 10, 25
N_FRAMES = 120000
RESULTS = {}


def timed(fn, *args, reps=5, warmup=2):
    def sync(r):
        jax.device_get(jax.tree_util.tree_leaves(r)[-1])
    for _ in range(warmup):
        sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def make_trainer(fused):
    model = ConvMixer(
        num_blocks=4, dimPosIn=66, dimPosEmb=50, dimPosOut=66,
        in_nTP=INPUT_N, out_nTP=OUTPUT_N, conv_nChan=1,
        conv1_kernel_shape=(1, 3), conv1_stride=(1, 1), conv1_padding=(0, 1),
        mode_conv="twice", activation="mish", regularization=0.1, use_se=True,
        r_se=8, use_max_pooling=False, encoder_n_harmonic_functions=64,
        encoder_omega0=0.1, encoder_fused=fused,
    )
    return Trainer(
        model, make_optimizer(lr=1e-3, steps_per_epoch=100),
        loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
        input_n=INPUT_N, output_n=OUTPUT_N, input_scale=1e-3,
    )


def main():
    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.randn(N_FRAMES, 96) * 300.0).astype(np.float32))
    n_windows = N_FRAMES - 35
    jax.block_until_ready(frames)

    # correctness on-chip first: fused loss == plain loss on one batch
    trp, trf = make_trainer(False), make_trainer(True)
    state = trp.init_state(jax.random.PRNGKey(0))
    s1 = jnp.asarray(rs.randint(0, n_windows, 64).astype(np.int32))
    w1 = jnp.ones((64,), jnp.float32)
    _, lp = jax.jit(trp._train_step_impl)(state, frames, s1, w1)
    _, lf = jax.jit(trf._train_step_impl)(state, frames, s1, w1)
    lp, lf = float(lp), float(lf)
    rel = abs(lp - lf) / abs(lp)
    RESULTS["loss_plain"] = lp
    RESULTS["loss_fused"] = lf
    print(f"one-step loss: plain {lp:.6f} fused {lf:.6f} rel {rel:.2e}",
          flush=True)
    assert rel < 1e-4, "fused kernel diverges from XLA on-chip"

    for batch, n_batches in ((50, 200), (512, 60), (2048, 30)):
        starts = jnp.asarray(
            rs.randint(0, n_windows, (n_batches, batch)).astype(np.int32))
        w = jnp.ones((n_batches, batch), jnp.float32)
        row = {}
        for name, tr in (("plain", trp), ("fused", trf)):
            st = tr.init_state(jax.random.PRNGKey(0))
            ep = jax.jit(tr._train_epoch_scan_impl)
            t = timed(lambda: ep(st, frames, starts, w)[1])
            row[f"{name}_us_per_step"] = t / n_batches * 1e6
            row[f"{name}_seq_s"] = n_batches * batch / t
        row["speedup"] = row["plain_us_per_step"] / row["fused_us_per_step"]
        RESULTS[f"b{batch}"] = row
        print(f"b{batch}: plain {row['plain_us_per_step']:.0f} us/step, "
              f"fused {row['fused_us_per_step']:.0f} us/step "
              f"({row['speedup']:.2f}x)", flush=True)
        with open("/tmp/perf_probe4.json", "w") as f:
            json.dump(RESULTS, f, indent=2)


if __name__ == "__main__":
    main()
