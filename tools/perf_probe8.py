"""Probe 8: the autoregressive trainer's conv lowering.

The AR flagship (conv_nChan=8, dimPosEmb=192, (5,5) kernels) runs at
~0.4-1.4 TF/s: a (B, T=10, E=192, C=8) conv with 8 output channels uses 8
of the MXU's 128 output lanes. Hypothesis: the SAME conv expressed as 5
time-shifted block-Toeplitz (E*C, E*C) matmuls (the E axis merged into the
contraction/output — the lane-matmul idea of ops/pallas_conv_mixer.py, but
as plain XLA so autodiff works) trades ~4.7x the FLOPs for ~16x the lane
utilization. Measures, in-scan, per-rep-synced:
  - conv-only: 8 sequential nn.Conv-equivalent (5,5) convs (XLA conv op)
  - toeplitz:  the same 8 convs as shifted banded matmuls
  - AR step:   fwd-rollout-only and the full closed-loop train step
Writes /tmp/perf_probe8.json.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
from motionmixerconv_tpu.models import ConvMixer
from motionmixerconv_tpu.train import make_optimizer
from motionmixerconv_tpu.train.autoreg_trainer import AutoregressiveTrainer

B, T, E, C = 50, 10, 192, 8
KH, KW = 5, 5
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


def conv_ref(x, w):
    """'SAME' (5,5) conv on (B, T, E, C), NHWC/HWIO — the model's op."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def toeplitz_weights(w):
    """(KH, KW, C, C) -> (KH, E*C, E*C) banded matmul weights.

    Wt[dt][(e+de-2)*C + ci, e*C + co] = w[dt, de, ci, co]; built as a sum of
    kron(shifted-diagonal(E), w[dt, de]) — traced once per jit.
    """
    eye = jnp.eye(E, dtype=w.dtype)
    mats = []
    for dt in range(KH):
        acc = jnp.zeros((E * C, E * C), w.dtype)
        for de in range(KW):
            off = de - KW // 2
            # D[e_src, e_out] = 1 iff e_src == e_out + off (within bounds)
            d = jnp.roll(eye, -off, axis=1) if off else eye
            if off > 0:
                d = d * (jnp.arange(E)[None, :] < E - off)
            elif off < 0:
                d = d * (jnp.arange(E)[None, :] >= -off)
            acc = acc + jnp.kron(d, w[dt, de])
        mats.append(acc)
    return jnp.stack(mats)


def conv_toeplitz(x, wt):
    """Same conv as KH time-shifted (B*T, E*C) @ (E*C, E*C) matmuls."""
    b, t, e, c = x.shape
    xf = x.reshape(b, t, e * c)
    out = jnp.zeros_like(xf)
    for dt in range(KH):
        off = dt - KH // 2
        xs = jnp.roll(xf, -off, axis=1)
        if off > 0:
            xs = xs * (jnp.arange(t)[None, :, None] < t - off)
        elif off < 0:
            xs = xs * (jnp.arange(t)[None, :, None] >= -off)
        out = out + xs @ wt[dt]
    return out.reshape(b, t, e, c)


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, T, E, C).astype(np.float32) * 0.3)
    ws = [jnp.asarray(rs.randn(KH, KW, C, C).astype(np.float32) * 0.05)
          for _ in range(8)]

    # correctness first
    got = np.asarray(conv_toeplitz(x, toeplitz_weights(ws[0])))
    want = np.asarray(conv_ref(x, ws[0]))
    err = np.abs(got - want).max() / np.abs(want).max()
    RESULTS["toeplitz_rel_err"] = float(err)
    print(f"toeplitz == conv: rel err {err:.2e}", flush=True)
    assert err < 1e-5

    n_iter = 60

    @jax.jit
    def scan_conv(x, ws):
        def step(c, _):
            y = c
            for w in ws:
                y = conv_ref(y, w)
            return y, y.sum()
        _, out = jax.lax.scan(step, x, jnp.arange(n_iter))
        return out.sum()

    @jax.jit
    def scan_toep(x, ws):
        wts = [toeplitz_weights(w) for w in ws]
        def step(c, _):
            y = c
            for wt in wts:
                y = conv_toeplitz(y, wt)
            return y, y.sum()
        _, out = jax.lax.scan(step, x, jnp.arange(n_iter))
        return out.sum()

    t_conv = timed(scan_conv, x, ws) / n_iter * 1e6
    t_toep = timed(scan_toep, x, ws) / n_iter * 1e6
    RESULTS["conv8_us"] = t_conv
    RESULTS["toeplitz8_us"] = t_toep
    RESULTS["conv_speedup"] = t_conv / t_toep
    print(f"8x(5,5)C8 conv: xla-conv {t_conv:.0f} us, toeplitz {t_toep:.0f} "
          f"us ({t_conv / t_toep:.2f}x)", flush=True)
    with open("/tmp/perf_probe8.json", "w") as f:
        json.dump(RESULTS, f, indent=2)

    # AR step decomposition
    frames = jnp.asarray((rs.randn(N_FRAMES, 96) * 300.0).astype(np.float32))
    n_windows = N_FRAMES - 35
    ar_model = ConvMixer(
        num_blocks=4, dimPosIn=66, dimPosEmb=192, dimPosOut=66, in_nTP=10,
        out_nTP=5, conv_nChan=8, conv1_kernel_shape=(5, 5),
        conv1_stride=(1, 1), conv1_padding=None, mode_conv="twice",
        activation="mish", regularization=-1.0, use_se=True, r_se=8,
        use_max_pooling=False, encoder_n_harmonic_functions=0,
        encoder_omega0=0.1,
    )
    ar = AutoregressiveTrainer(
        ar_model, make_optimizer(lr=1e-4, steps_per_epoch=100, clip_grad=1.0),
        loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ, input_n=10,
        output_n=25, input_n_model=10, output_n_model=5, step_window=5,
    )
    state = ar.init_state(jax.random.PRNGKey(0))
    n_batches = 30
    starts = jnp.asarray(
        rs.randint(0, n_windows, (n_batches, B)).astype(np.int32))
    w = jnp.ones((n_batches, B), jnp.float32)
    variables = state.variables()

    from motionmixerconv_tpu.data.windows import gather_windows

    @jax.jit
    def ep_rollout_fwd(v):
        def step(c, sw):
            s, ww = sw
            batch = gather_windows(frames, s, 35)
            seq = jnp.take(batch, jnp.asarray(H36M_DIM_USED_XYZ), axis=2)
            per, _ = ar._rollout(v, seq, teacher_forcing=False)
            return c, (per * ww).sum()
        _, out = jax.lax.scan(step, 0.0, (starts, w))
        return out.sum()

    ep_full = jax.jit(
        lambda s: ar._ar_epoch_scan_impl(s, frames, starts, w, False)[1])

    t_fwd = timed(ep_rollout_fwd, variables) / n_batches * 1e6
    t_full = timed(ep_full, state) / n_batches * 1e6
    RESULTS["ar_rollout_fwd_us"] = t_fwd
    RESULTS["ar_full_us"] = t_full
    print(f"AR b50: rollout-fwd {t_fwd:.0f} us/step, full {t_full:.0f} "
          f"us/step", flush=True)
    with open("/tmp/perf_probe8.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


if __name__ == "__main__":
    main()
