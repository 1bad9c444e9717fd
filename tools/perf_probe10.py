"""Probe 10: is the AR closed-loop backward slow because of lax.scan?

Probe 9: full CL step 26.9 ms vs TF 4.5 ms at b50 (same FLOPs); remat no
help, optimizer free, BN ~17%. The rollout scans 5 steps; reverse-mode
through scan saves residuals and runs a backward scan, which blocks fusion
across step boundaries. With n_steps=5 static, unrolling is free.

Variants (grad-only epoch, in-scan over 30 batches, per-rep synced, b50):
  - scan (current production path)
  - scan with unroll=n_steps
  - Python-loop unrolled rollout
Writes /tmp/perf_probe10.json.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
from motionmixerconv_tpu.data.windows import gather_windows
from motionmixerconv_tpu.models import ConvMixer
from motionmixerconv_tpu.train import make_optimizer
from motionmixerconv_tpu.train.autoreg_trainer import AutoregressiveTrainer

B = 50
N_FRAMES = 120000
RESULTS = {}
DIMS = jnp.asarray(H36M_DIM_USED_XYZ)
IN_M, OUT_M, STEP_W, N_STEPS = 10, 5, 5, 5


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


def make_ar():
    model = ConvMixer(
        num_blocks=4, dimPosIn=66, dimPosEmb=192, dimPosOut=66, in_nTP=10,
        out_nTP=5, conv_nChan=8, conv1_kernel_shape=(5, 5),
        conv1_stride=(1, 1), conv1_padding=None, mode_conv="twice",
        activation="mish", regularization=-1.0, use_se=True, r_se=8,
        use_max_pooling=False, encoder_n_harmonic_functions=0,
        encoder_omega0=0.1,
    )
    return AutoregressiveTrainer(
        model, make_optimizer(lr=1e-4, steps_per_epoch=100, clip_grad=1.0),
        loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ, input_n=10,
        output_n=25, input_n_model=10, output_n_model=5, step_window=5,
    )


def main():
    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.randn(N_FRAMES, 96) * 300.0).astype(np.float32))
    n_windows = N_FRAMES - 35
    n_batches = 30
    starts = jnp.asarray(
        rs.randint(0, n_windows, (n_batches, B)).astype(np.int32))
    w = jnp.ones((n_batches, B), jnp.float32)

    ar = make_ar()
    st = ar.init_state(jax.random.PRNGKey(0))
    model = ar.model

    def per_loss(pred, gt):
        d = pred - gt
        return jnp.mean(
            jnp.linalg.norm(d.reshape(d.shape[0], -1, 3), axis=-1), axis=-1
        ).sum(axis=-1) if d.ndim == 3 else d

    def mpjpe_ps(pred, gt):
        diff = (pred - gt).reshape(pred.shape[0], -1, 3)
        return jnp.mean(jnp.linalg.norm(diff, axis=-1), axis=-1)

    def apply_with(variables, x):
        out = model.apply(variables, x, training=True,
                          mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(0)})
        return out[0] if isinstance(out, tuple) else out

    def rollout_loss_factory(mode):
        def rollout_loss(params, seq):
            v = {"params": params}
            if st.batch_stats:
                v["batch_stats"] = st.batch_stats
            gt_steps = jnp.stack([
                jax.lax.dynamic_slice_in_dim(seq, s * STEP_W + IN_M, OUT_M, 1)
                for s in range(N_STEPS)
            ])
            window0 = seq[:, :IN_M]

            def step(window, gt):
                pred = apply_with(v, window)
                loss = mpjpe_ps(pred, gt)
                new_window = jnp.concatenate(
                    [window[:, STEP_W:], pred], axis=1)
                return new_window, loss

            if mode == "scan":
                _, losses = jax.lax.scan(step, window0, gt_steps)
                total = losses.sum()
            elif mode == "scan_unroll":
                _, losses = jax.lax.scan(step, window0, gt_steps,
                                         unroll=N_STEPS)
                total = losses.sum()
            else:  # python loop
                win = window0
                total = 0.0
                for s in range(N_STEPS):
                    win, loss = step(win, gt_steps[s])
                    total = total + loss.sum()
                return total
            return total

        return rollout_loss

    def grad_epoch(mode):
        rl = rollout_loss_factory(mode)

        @jax.jit
        def ep(params):
            def step(c, sw):
                s, ww = sw
                batch = gather_windows(frames, s, 35)
                seq = jnp.take(batch, DIMS, axis=2)
                loss, g = jax.value_and_grad(rl)(params, seq)
                gsum = jax.tree_util.tree_reduce(
                    lambda a, x: a + x.sum(), g, 0.0)
                return c, loss + 0.0 * gsum
            _, out = jax.lax.scan(step, 0.0, (starts, w))
            return out.sum()

        return timed(lambda: ep(st.params)) / n_batches * 1e6

    for mode in ["scan", "scan_unroll", "pyloop"]:
        RESULTS[f"grad_{mode}_us"] = grad_epoch(mode)
        print(f"grad {mode}: {RESULTS[f'grad_{mode}_us']:.0f} us/step",
              flush=True)
    with open("/tmp/perf_probe10.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


if __name__ == "__main__":
    main()
