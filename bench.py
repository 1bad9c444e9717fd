"""Benchmark: training sequences/sec on the flagship H36M ConvMixer config.

Measures this framework's jitted train-step throughput on the default JAX
device (TPU under the driver) against the PyTorch-CPU reference baseline
(reference model + torch Adam at train_mixer_h36m.py defaults). The torch
baseline is measured live when /root/reference is available and cached to
tests/golden/bench_baseline.json otherwise.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "tests", "golden", "bench_baseline.json")
REFERENCE = "/root/reference"

BATCH = 50  # reference default (train_mixer_h36m.py:510)
INPUT_N, OUTPUT_N, POSE_DIM = 10, 25, 66
MODEL_KW = dict(
    num_blocks=4, hidden=50, k=(1, 3), pad=(0, 1), r_se=8, nharm=64
)
N_FRAMES = 20000  # synthetic corpus size


def _synth_frames(rs):
    return (rs.randn(N_FRAMES, 96) * 300.0).astype(np.float32)


def measure_torch_baseline(steps: int = 30) -> float:
    """Reference ConvMixer + torch Adam on CPU, sequences/sec."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # reference hardcodes .cuda()
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, os.path.join(REFERENCE, "conv_mixer"))
    from h36m.conv_mixer_model import ConvMixer as RefConvMixer
    from h36m.utils.utils_mixer import mpjpe_error as ref_mpjpe

    torch.manual_seed(0)
    model = RefConvMixer(
        num_blocks=4, dimPosIn=POSE_DIM, dimPosEmb=50, dimPosOut=POSE_DIM,
        in_nTP=INPUT_N, out_nTP=OUTPUT_N, conv_nChan=1,
        conv1_kernel_shape=(1, 3), conv1_stride=(1, 1), conv1_padding=(0, 1),
        mode_conv="twice", activation="mish", regularization=0.1,
        use_se=True, r_se=8, use_max_pooling=False,
        encoder_n_harmonic_functions=64, encoder_omega0=0.1,
    )
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-5)
    rs = np.random.RandomState(0)
    xb = torch.from_numpy(rs.randn(BATCH, INPUT_N, POSE_DIM).astype(np.float32))
    yb = torch.from_numpy(rs.randn(BATCH, OUTPUT_N, POSE_DIM).astype(np.float32))
    model.train()
    for _ in range(3):  # warmup
        opt.zero_grad(); loss = ref_mpjpe(model(xb), yb); loss.backward(); opt.step()
    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad(); loss = ref_mpjpe(model(xb), yb); loss.backward(); opt.step()
    dt = time.perf_counter() - t0
    return steps * BATCH / dt


def get_baseline() -> float:
    if os.path.isdir(REFERENCE):
        try:
            v = measure_torch_baseline()
            os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
            with open(BASELINE_CACHE, "w") as f:
                json.dump({"torch_cpu_seq_per_sec": v, "batch": BATCH}, f)
            return v
        except Exception as e:  # fall through to cache
            print(f"# torch baseline failed live: {e}", file=sys.stderr)
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return float(json.load(f)["torch_cpu_seq_per_sec"])
    return float("nan")


def measure_jax(steps: int = 200) -> float:
    import jax
    import jax.numpy as jnp

    from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
    from motionmixerconv_tpu.models import ConvMixer
    from motionmixerconv_tpu.train import Trainer, make_optimizer

    model = ConvMixer(
        num_blocks=4, dimPosIn=POSE_DIM, dimPosEmb=50, dimPosOut=POSE_DIM,
        in_nTP=INPUT_N, out_nTP=OUTPUT_N, conv_nChan=1,
        conv1_kernel_shape=(1, 3), conv1_stride=(1, 1), conv1_padding=(0, 1),
        mode_conv="twice", activation="mish", regularization=0.1,
        use_se=True, r_se=8, use_max_pooling=False,
        encoder_n_harmonic_functions=64, encoder_omega0=0.1,
    )
    opt = make_optimizer(lr=1e-3, steps_per_epoch=100)
    trainer = Trainer(
        model, opt, loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
        input_n=INPUT_N, output_n=OUTPUT_N, input_scale=1e-3,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))

    rs = np.random.RandomState(0)
    frames = jnp.asarray(_synth_frames(rs))
    seq_len = INPUT_N + OUTPUT_N
    n_windows = N_FRAMES - seq_len

    # the real training path: the whole epoch is ONE jitted lax.scan dispatch
    n_batches = max(1, steps)
    starts = jnp.asarray(
        rs.randint(0, n_windows, size=(n_batches, BATCH)).astype(np.int32)
    )
    w = jnp.ones((n_batches, BATCH), jnp.float32)

    # warmup (compile)
    state, loss = trainer._train_epoch_scan(state, frames, starts, w)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    n_epochs = 3
    for _ in range(n_epochs):
        state, loss = trainer._train_epoch_scan(state, frames, starts, w)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return n_epochs * n_batches * BATCH / dt


def main():
    baseline = get_baseline()
    value = measure_jax()
    vs = value / baseline if baseline == baseline else float("nan")
    print(json.dumps({
        "metric": "train_sequences_per_sec",
        "value": round(value, 1),
        "unit": "seq/s (H36M ConvMixer defaults, batch 50)",
        "vs_baseline": round(vs, 2) if vs == vs else None,
    }))


if __name__ == "__main__":
    main()
