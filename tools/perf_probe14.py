"""Probe 14: fused Pallas kernel + angle-doubling trig on the train step.

Probe 13 showed the plain-XLA doubling recurrence is a wash (0.91-1.06x):
it trades the VPU trig for the SAME 692 MB materialized-embedding HBM
traffic. The fused Pallas kernel (ops/pallas_harmonic.py) eliminates that
traffic but lost 0.46-0.56x with direct trig because it pays the sin/cos
in the forward AND the backward recompute. This probe measures the
combination — fused kernel with the doubling recurrence (one transcendental
pair, no materialized embedding) — on the REAL scan-epoch train step,
against plain XLA direct (production default) and fused direct (the
measured loser, for reference). The plain-XLA doubling column is probe
13's measurement (tools/perf_probe13.py) — run both to reproduce the full
DESIGN.md §6 adjudication table.

Per-rep-synced medians (warm twice, >=3 reps each ending in a device_get
of the loss). Writes /tmp/perf_probe14.json.
"""

from __future__ import annotations

import json
import time

import numpy as np

N_FRAMES = 120000
INPUT_N, OUTPUT_N = 10, 25
RESULTS = {}


def log(m):
    print(m, flush=True)


def _trainer(impl, fused):
    from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
    from motionmixerconv_tpu.models import ConvMixer
    from motionmixerconv_tpu.train import Trainer, make_optimizer

    model = ConvMixer(
        num_blocks=4, dimPosIn=66, dimPosEmb=50, dimPosOut=66,
        in_nTP=INPUT_N, out_nTP=OUTPUT_N, conv_nChan=1,
        conv1_kernel_shape=(1, 3), conv1_stride=(1, 1), conv1_padding=(0, 1),
        mode_conv="twice", activation="mish", regularization=0.1, use_se=True,
        r_se=8, use_max_pooling=False, encoder_n_harmonic_functions=64,
        encoder_omega0=0.1, encoder_harmonic_impl=impl, encoder_fused=fused,
    )
    return Trainer(
        model, make_optimizer(lr=1e-3, steps_per_epoch=100),
        loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
        input_n=INPUT_N, output_n=OUTPUT_N, input_scale=1e-3,
    )


def measure(impl, fused, batch, n_batches, frames, reps=5):
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(1)
    tr = _trainer(impl, fused)
    state = tr.init_state(jax.random.PRNGKey(0))
    n_windows = N_FRAMES - (INPUT_N + OUTPUT_N)
    starts = jnp.asarray(
        rs.randint(0, n_windows, size=(n_batches, batch)).astype(np.int32))
    w = jnp.ones((n_batches, batch), jnp.float32)

    fn = jax.jit(tr._train_epoch_scan_impl)  # no donation: state reused

    def run():
        _, loss = fn(state, frames, starts, w)
        return jax.device_get(loss)

    first = run()
    run()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    return {
        "impl": impl, "fused": fused, "batch": batch,
        "n_batches": n_batches, "epoch_ms": dt * 1e3,
        "step_us": dt / n_batches * 1e6,
        "seq_per_s": n_batches * batch / dt,
        "spread": (max(ts) - min(ts)) / dt,
        "epoch_loss": float(first),
    }


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {getattr(dev, 'device_kind', dev)}")
    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.randn(N_FRAMES, 96) * 300.0).astype(np.float32))

    variants = [
        ("direct", False, "plain-direct"),
        ("doubling", True, "fused-doubling"),
        ("direct", True, "fused-direct"),
    ]
    for batch in (512, 2048, 50):
        n_batches = max(10, min(200, 12000 // batch * 4))
        row = {}
        for impl, fused, name in variants:
            r = measure(impl, fused, batch, n_batches, frames)
            row[name] = r
            log(f"b{batch} {name:>15}: {r['step_us']:7.0f} us/step  "
                f"{r['seq_per_s'] / 1e3:7.1f} k seq/s  "
                f"spread {r['spread']:.2f}  loss {r['epoch_loss']:.4f}")
        sp = row["plain-direct"]["step_us"] / row["fused-doubling"]["step_us"]
        log(f"b{batch}: fused-doubling vs plain-direct {sp:.2f}x")
        RESULTS[f"b{batch}"] = {**row, "speedup_fused_doubling": sp}

    with open("/tmp/perf_probe14.json", "w") as f:
        json.dump(RESULTS, f, indent=2)
    log("wrote /tmp/perf_probe14.json")


if __name__ == "__main__":
    main()
