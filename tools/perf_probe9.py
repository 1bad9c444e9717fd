"""Probe 9: where does the AR step's backward go?

Probe 8/8b: AR full step 27.1 ms vs rollout-fwd 2.8 ms at b50, yet a
conv-chain fwd+bwd is only 2.8x its fwd. Variants measured here (in-scan,
per-rep-synced, b50):
  - full closed-loop step, BN (production config)     [reference point]
  - grad-only (no optimizer update)
  - full step, teacher forcing (batched, no feedback chain)
  - full step, closed loop, regularization=0 (no BatchNorm)
  - grad of rollout with jax.checkpoint on the rollout step
Writes /tmp/perf_probe9.json.
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
from motionmixerconv_tpu.train.loop import _per_sample_mpjpe, _wmean
from motionmixerconv_tpu.train.autoreg_trainer import AutoregressiveTrainer

B = 50
N_FRAMES = 120000
RESULTS = {}
DIMS = jnp.asarray(H36M_DIM_USED_XYZ)


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


def make_ar(reg):
    model = ConvMixer(
        num_blocks=4, dimPosIn=66, dimPosEmb=192, dimPosOut=66, in_nTP=10,
        out_nTP=5, conv_nChan=8, conv1_kernel_shape=(5, 5),
        conv1_stride=(1, 1), conv1_padding=None, mode_conv="twice",
        activation="mish", regularization=reg, use_se=True, r_se=8,
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

    ar_bn = make_ar(-1.0)
    st_bn = ar_bn.init_state(jax.random.PRNGKey(0))
    ar_no = make_ar(0.0)
    st_no = ar_no.init_state(jax.random.PRNGKey(0))

    def ep_full(ar, st, tf):
        fn = jax.jit(lambda s: ar._ar_epoch_scan_impl(
            s, frames, starts, w, tf)[1])
        return timed(lambda: fn(st)) / n_batches * 1e6

    def ep_grad_only(ar, st, remat):
        variables = st.variables()

        def rollout_loss(params, seq, rng):
            v = {"params": params}
            if st.batch_stats:
                v["batch_stats"] = st.batch_stats
            per, _ = ar._rollout(v, seq, teacher_forcing=False, rng=rng,
                                 training=True)
            return per.sum()

        if remat:
            rollout_loss = jax.checkpoint(rollout_loss)

        @jax.jit
        def ep(params):
            def step(c, sw):
                s, ww = sw
                batch = gather_windows(frames, s, 35)
                seq = jnp.take(batch, DIMS, axis=2)
                loss, g = jax.value_and_grad(rollout_loss)(
                    params, seq, jax.random.PRNGKey(0))
                gsum = jax.tree_util.tree_reduce(
                    lambda a, x: a + x.sum(), g, 0.0)
                return c, loss + 0.0 * gsum
            _, out = jax.lax.scan(step, 0.0, (starts, w))
            return out.sum()

        return timed(lambda: ep(st.params)) / n_batches * 1e6

    RESULTS["full_bn_cl_us"] = ep_full(ar_bn, st_bn, False)
    print(f"full BN closed-loop: {RESULTS['full_bn_cl_us']:.0f} us/step",
          flush=True)
    RESULTS["full_bn_tf_us"] = ep_full(ar_bn, st_bn, True)
    print(f"full BN teacher-forced: {RESULTS['full_bn_tf_us']:.0f} us/step",
          flush=True)
    RESULTS["full_noreg_cl_us"] = ep_full(ar_no, st_no, False)
    print(f"full no-BN closed-loop: {RESULTS['full_noreg_cl_us']:.0f} us/step",
          flush=True)
    RESULTS["grad_bn_cl_us"] = ep_grad_only(ar_bn, st_bn, remat=False)
    print(f"grad-only BN closed-loop: {RESULTS['grad_bn_cl_us']:.0f} us/step",
          flush=True)
    RESULTS["grad_bn_cl_remat_us"] = ep_grad_only(ar_bn, st_bn, remat=True)
    print(f"grad-only BN CL remat: {RESULTS['grad_bn_cl_remat_us']:.0f} "
          f"us/step", flush=True)
    with open("/tmp/perf_probe9.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


if __name__ == "__main__":
    main()
