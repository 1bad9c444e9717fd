"""Probe 3: where does the flagship forward go? (encoder vs mixer blocks)

The flagship ConvMixer's PoseEncoder (64 harmonics) expands 66 features to
8448 (sin/cos) and projects to E=50 — ~94% of the model's FLOPs and a
(B, T, 8448) materialized intermediate. This probe separates, at b2048 in
the production scan-over-batches shape:
  - trig-only:   materialize the harmonic embedding, no matmul
  - embed-mm:    matmul a pre-materialized (B*T, 8448) by (8448, 50)
  - encoder:     PoseEncoder forward (trig + matmul)
  - noharm:      full model with n_harmonic_functions=0 (mixer-only cost)
  - full fwd:    full model forward
Writes /tmp/perf_probe3.json.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
from motionmixerconv_tpu.data.windows import gather_windows
from motionmixerconv_tpu.models import ConvMixer, PoseEncoder
from motionmixerconv_tpu.train import Trainer, make_optimizer

INPUT_N, OUTPUT_N = 10, 25
SEQ_LEN = INPUT_N + OUTPUT_N
N_FRAMES = 120000
RESULTS = {}


def log(m):
    print(m, flush=True)


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


def make_model(nharm):
    return ConvMixer(
        num_blocks=4, dimPosIn=66, dimPosEmb=50, dimPosOut=66,
        in_nTP=INPUT_N, out_nTP=OUTPUT_N, conv_nChan=1,
        conv1_kernel_shape=(1, 3), conv1_stride=(1, 1), conv1_padding=(0, 1),
        mode_conv="twice", activation="mish", regularization=0.1, use_se=True,
        r_se=8, use_max_pooling=False, encoder_n_harmonic_functions=nharm,
        encoder_omega0=0.1,
    )


def main():
    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.randn(N_FRAMES, 96) * 300.0).astype(np.float32))
    n_windows = N_FRAMES - SEQ_LEN
    batch, n_batches = 2048, 30
    starts = jnp.asarray(
        rs.randint(0, n_windows, (n_batches, batch)).astype(np.int32))
    w = jnp.ones((n_batches, batch), jnp.float32)
    dims = jnp.asarray(H36M_DIM_USED_XYZ)
    freqs = 0.1 * (2.0 ** jnp.arange(64, dtype=jnp.float32))

    def scan(body):
        @jax.jit
        def ep(*args):
            def step(c, sw):
                s, _ = sw
                return c, body(s, *args)
            _, out = jax.lax.scan(step, 0.0, (starts, w))
            return out.sum()
        return ep

    def get_x(s):
        b = gather_windows(frames, s, SEQ_LEN)
        return jnp.take(b, dims, axis=2)[:, :INPUT_N] * 1e-3

    # trig only
    def trig_body(s):
        x = get_x(s)
        e = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
        emb = jnp.concatenate([jnp.sin(e), jnp.cos(e)], axis=-1)
        return emb.sum()

    t = timed(scan(trig_body), reps=5)
    RESULTS["trig_us"] = t / n_batches * 1e6
    log(f"trig-only: {RESULTS['trig_us']:.0f} us/step")

    # embed matmul on pre-materialized input
    emb_const = jnp.asarray(
        rs.randn(batch * INPUT_N, 8448).astype(np.float32) * 0.3)
    W = jnp.asarray(rs.randn(8448, 50).astype(np.float32) * 0.01)

    def mm_body(s, emb, W):
        return (emb @ W).sum() + s.sum() * 0.0

    t = timed(scan(mm_body), emb_const, W, reps=5)
    RESULTS["embed_mm_us"] = t / n_batches * 1e6
    log(f"embed-mm (pre-materialized): {RESULTS['embed_mm_us']:.0f} us/step")

    # encoder only
    enc = PoseEncoder(dimPosIn=66, dimPosEmb=50, conv_nChan=1,
                      n_harmonic_functions=64, omega0=0.1)
    ev = enc.init(jax.random.PRNGKey(0), jnp.zeros((2, INPUT_N, 66)))

    def enc_body(s, ev):
        return enc.apply(ev, get_x(s)).sum()

    t = timed(scan(enc_body), ev, reps=5)
    RESULTS["encoder_us"] = t / n_batches * 1e6
    log(f"encoder fwd: {RESULTS['encoder_us']:.0f} us/step")

    # full model, nharm=0 vs 64
    for nharm, key in ((0, "noharm_fwd_us"), (64, "full_fwd_us")):
        model = make_model(nharm)
        tr = Trainer(model, make_optimizer(lr=1e-3, steps_per_epoch=100),
                     loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
                     input_n=INPUT_N, output_n=OUTPUT_N, input_scale=1e-3)
        variables = tr.init_state(jax.random.PRNGKey(0)).variables()

        def fwd_body(s, v):
            b = gather_windows(frames, s, SEQ_LEN)
            mi, gt, _ = tr._prepare(b)
            out, _ = tr._forward(v, mi, training=False)
            return out.sum()

        t = timed(scan(fwd_body), variables, reps=5)
        RESULTS[key] = t / n_batches * 1e6
        log(f"{key}: {RESULTS[key]:.0f} us/step")

    with open("/tmp/perf_probe3.json", "w") as f:
        json.dump(RESULTS, f, indent=2)
    log("wrote /tmp/perf_probe3.json")


if __name__ == "__main__":
    main()
