"""Probe 2: scanned-step decomposition + bf16 re-measurement (honest).

All timings per-rep-synced scan epochs (see tools/perf_probe.py). For the
flagship H36M ConvMixer at b512/b2048 this separates, inside the SAME
scan-over-batches dispatch shape production uses:
  - gather-only       (window gather + dim select + scale)
  - fwd               (gather + forward + loss)
  - grad              (gather + forward + loss + backward; no optimizer)
  - full              (the real train step incl. Adam + weight decay)
and re-measures the dtype=bfloat16 model honestly (the r2 "bf16 is a
measured loss" claim came from invalid timings).

Writes /tmp/perf_probe2.json.
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
from motionmixerconv_tpu.train import Trainer, make_optimizer
from motionmixerconv_tpu.train.loop import _per_sample_mpjpe, _wmean

INPUT_N, OUTPUT_N = 10, 25
SEQ_LEN = INPUT_N + OUTPUT_N
N_FRAMES = 120000

RESULTS: dict = {}


def log(m):
    print(m, flush=True)


def timed(fn, *args, reps=5, warmup=2):
    def sync(r):
        leaves = jax.tree_util.tree_leaves(r)
        if leaves:
            jax.device_get(leaves[-1])

    for _ in range(warmup):
        sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def make_trainer(emb=50, dtype=None):
    model = ConvMixer(
        num_blocks=4, dimPosIn=66, dimPosEmb=emb, dimPosOut=66,
        in_nTP=INPUT_N, out_nTP=OUTPUT_N, conv_nChan=1,
        conv1_kernel_shape=(1, 3), conv1_stride=(1, 1), conv1_padding=(0, 1),
        mode_conv="twice", activation="mish", regularization=0.1, use_se=True,
        r_se=8, use_max_pooling=False, encoder_n_harmonic_functions=64,
        encoder_omega0=0.1, dtype=dtype,
    )
    return Trainer(
        model, make_optimizer(lr=1e-3, steps_per_epoch=100),
        loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
        input_n=INPUT_N, output_n=OUTPUT_N, input_scale=1e-3,
    )


def main():
    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.randn(N_FRAMES, 96) * 300.0).astype(np.float32))
    n_windows = N_FRAMES - SEQ_LEN
    jax.block_until_ready(frames)

    for batch, n_batches in ((512, 60), (2048, 30)):
        tr = make_trainer()
        state = tr.init_state(jax.random.PRNGKey(0))
        variables = state.variables()
        starts = jnp.asarray(
            rs.randint(0, n_windows, (n_batches, batch)).astype(np.int32))
        w = jnp.ones((n_batches, batch), jnp.float32)
        row = {"n_batches": n_batches}

        @jax.jit
        def ep_gather(fr, st, ww):
            def step(c, sw):
                s, _ = sw
                b = gather_windows(fr, s, SEQ_LEN)
                mi, gt, _ = tr._prepare(b)
                return c, mi.sum() + gt.sum()
            _, out = jax.lax.scan(step, 0.0, (st, ww))
            return out.sum()

        @jax.jit
        def ep_fwd(v, fr, st, ww):
            def step(c, sw):
                s, wv = sw
                b = gather_windows(fr, s, SEQ_LEN)
                mi, gt, _ = tr._prepare(b)
                pred, _ = tr._forward(v, mi, training=False)
                return c, _wmean(_per_sample_mpjpe(pred, gt), wv)
            _, out = jax.lax.scan(step, 0.0, (st, ww))
            return out.sum()

        @jax.jit
        def ep_grad(st_state, fr, st, ww):
            def step(carry, sw):
                s, wv = sw
                b = gather_windows(fr, s, SEQ_LEN)
                mi, gt, _ = tr._prepare(b)

                def loss_fn(params):
                    pred = tr.model.apply(
                        {"params": params}, mi, training=True,
                        rngs={"dropout": carry.rng},
                    ).astype(jnp.float32)
                    return _wmean(_per_sample_mpjpe(pred, gt), wv)

                loss, grads = jax.value_and_grad(loss_fn)(carry.params)
                gsum = jax.tree_util.tree_reduce(
                    lambda a, g: a + g.sum(), grads, 0.0)
                return carry, loss + 0.0 * gsum
            _, out = jax.lax.scan(step, st_state, (st, ww))
            return out.sum()

        ep_full = jax.jit(tr._train_epoch_scan_impl)

        t_gather = timed(ep_gather, frames, starts, w)
        t_fwd = timed(ep_fwd, variables, frames, starts, w)
        t_grad = timed(ep_grad, state, frames, starts, w)
        t_full = timed(lambda: ep_full(state, frames, starts, w)[1])
        row.update(
            gather_us=t_gather / n_batches * 1e6,
            fwd_us=t_fwd / n_batches * 1e6,
            grad_us=t_grad / n_batches * 1e6,
            full_us=t_full / n_batches * 1e6,
        )
        log(f"b{batch}: gather {row['gather_us']:.0f} | fwd {row['fwd_us']:.0f}"
            f" | +bwd {row['grad_us']:.0f} | full {row['full_us']:.0f} us/step")

        # bf16 model compute, full train step
        trb = make_trainer(dtype=jnp.bfloat16)
        stb = trb.init_state(jax.random.PRNGKey(0))
        epb = jax.jit(trb._train_epoch_scan_impl)
        t_b = timed(lambda: epb(stb, frames, starts, w)[1])
        row["bf16_full_us"] = t_b / n_batches * 1e6
        log(f"b{batch}: bf16 full {row['bf16_full_us']:.0f} us/step")

        RESULTS[f"b{batch}"] = row
        with open("/tmp/perf_probe2.json", "w") as f:
            json.dump(RESULTS, f, indent=2)
    log("wrote /tmp/perf_probe2.json")


if __name__ == "__main__":
    main()
