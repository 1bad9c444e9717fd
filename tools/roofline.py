"""Measured decomposition of the training step (DESIGN.md §6 "where the
time goes") — reproducible on any chip.

For the flagship H36M ConvMixer scan-epoch trainer it reports, per batch
size: wall per epoch call, per-scan-step time, XLA cost-analysis FLOPs,
achieved FLOP/s, and the lane-alignment experiment (E=50 vs E=128 at the
same batch — same step time, 2.6x the FLOPs => the step is MXU-tile-bound
and lane-aligned widths run at the chip's f32 peak).

Usage: python tools/roofline.py [--batches 50 512 2048]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

N_FRAMES = 120000
INPUT_N, OUTPUT_N = 10, 25


def _trainer(emb):
    from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
    from motionmixerconv_tpu.models import ConvMixer
    from motionmixerconv_tpu.train import Trainer, make_optimizer

    model = ConvMixer(
        num_blocks=4, dimPosIn=66, dimPosEmb=emb, dimPosOut=66,
        in_nTP=INPUT_N, out_nTP=OUTPUT_N, conv_nChan=1,
        conv1_kernel_shape=(1, 3), conv1_stride=(1, 1), conv1_padding=(0, 1),
        mode_conv="twice", activation="mish", regularization=0.1, use_se=True,
        r_se=8, use_max_pooling=False, encoder_n_harmonic_functions=64,
        encoder_omega0=0.1,
    )
    return Trainer(
        model, make_optimizer(lr=1e-3, steps_per_epoch=100),
        loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
        input_n=INPUT_N, output_n=OUTPUT_N, input_scale=1e-3,
    )


def measure(emb, batch, n_batches, frames, reps=10):
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(1)
    tr = _trainer(emb)
    state = tr.init_state(jax.random.PRNGKey(0))
    n_windows = N_FRAMES - (INPUT_N + OUTPUT_N)
    starts = jnp.asarray(
        rs.randint(0, n_windows, size=(n_batches, batch)).astype(np.int32))
    w = jnp.ones((n_batches, batch), jnp.float32)
    fn = tr._train_epoch_scan
    comp = fn.lower(state, frames, starts, w).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", 0.0)) if ca else 0.0
    state, loss = fn(state, frames, starts, w)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, loss = fn(state, frames, starts, w)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / reps
    return {
        "emb": emb, "batch": batch, "n_batches": n_batches,
        "epoch_ms": dt * 1e3, "step_us": dt / n_batches * 1e6,
        "mflop_per_step": flops / n_batches / 1e6,
        "tflops": flops / dt / 1e12,
        "seq_per_s": n_batches * batch / dt,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[50, 512, 2048])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}")
    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.randn(N_FRAMES, 96) * 300.0).astype(np.float32))

    print("\n-- batch scaling (flagship, E=50) --")
    for batch in args.batches:
        n_batches = max(10, min(200, 12000 // batch * 4))
        r = measure(50, batch, n_batches, frames)
        print(f"B={r['batch']:>5}: {r['epoch_ms']:6.2f} ms/epoch-call  "
              f"{r['step_us']:6.0f} us/step  {r['mflop_per_step']:8.1f} "
              f"MF/step  {r['tflops']:6.2f} TFLOP/s  "
              f"{r['seq_per_s'] / 1e6:6.1f} M seq/s")

    print("\n-- lane alignment at B=2048 (same wall, 2.6x FLOPs) --")
    for emb in (50, 128):
        r = measure(emb, 2048, 30, frames)
        print(f"E={emb:>3}: {r['step_us']:6.0f} us/step  "
              f"{r['tflops']:6.2f} TFLOP/s")


if __name__ == "__main__":
    main()
