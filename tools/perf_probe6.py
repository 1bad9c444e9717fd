"""Probe 6: corpus-level harmonic-embedding cache vs per-step trig.

The harmonic embedding depends only on the (static) corpus frames, not on
parameters — so it can be computed ONCE per corpus (bit-identical
jnp.sin values, just batched over frames) and each train step gathers
embedding windows instead of recomputing 346M transcendentals. Cost: the
cache is (N_frames, 2*n*D) f32 = 4.05 GB for the 120k-frame bench corpus.

Measures the full train step (fwd+bwd+Adam) in the production scan shape,
plain vs cached, at b50/b512/b2048. Writes /tmp/perf_probe6.json.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
from motionmixerconv_tpu.data.windows import gather_windows
from motionmixerconv_tpu.models import ConvMixer, PoseEncoder
from motionmixerconv_tpu.train import Trainer, make_optimizer

INPUT_N, OUTPUT_N = 10, 25
SEQ_LEN = INPUT_N + OUTPUT_N
N_FRAMES = 120000
NH, OMEGA0 = 64, 0.1
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


def make_model(precomputed):
    return ConvMixer(
        num_blocks=4, dimPosIn=66, dimPosEmb=50, dimPosOut=66,
        in_nTP=INPUT_N, out_nTP=OUTPUT_N, conv_nChan=1,
        conv1_kernel_shape=(1, 3), conv1_stride=(1, 1), conv1_padding=(0, 1),
        mode_conv="twice", activation="mish", regularization=0.1, use_se=True,
        r_se=8, use_max_pooling=False, encoder_n_harmonic_functions=NH,
        encoder_omega0=OMEGA0, encoder_precomputed=precomputed,
    )


def main():
    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.randn(N_FRAMES, 96) * 300.0).astype(np.float32))
    n_windows = N_FRAMES - SEQ_LEN
    dims = jnp.asarray(H36M_DIM_USED_XYZ)
    jax.block_until_ready(frames)

    # corpus embedding cache, chunked to bound the transient
    @jax.jit
    def embed_chunk(fr):
        x = jnp.take(fr, dims, axis=1) * 1e-3
        return PoseEncoder.harmonic_features(x, NH, OMEGA0)

    t0 = time.perf_counter()
    chunks = [embed_chunk(frames[i:i + 20000]) for i in range(0, N_FRAMES, 20000)]
    embed_frames = jnp.concatenate(chunks, axis=0)
    del chunks
    jax.block_until_ready(embed_frames)
    RESULTS["cache_build_s"] = time.perf_counter() - t0
    RESULTS["cache_gb"] = embed_frames.nbytes / 1e9
    print(f"cache: {RESULTS['cache_gb']:.2f} GB in "
          f"{RESULTS['cache_build_s']:.2f} s", flush=True)

    model = make_model(True)
    opt = make_optimizer(lr=1e-3, steps_per_epoch=100)
    x0 = jnp.zeros((2, INPUT_N, 2 * NH * 66), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, training=False)
    params = variables["params"]
    opt_state = opt.init(params)

    def step(params, opt_state, rng, emb_fr, fr, s, w):
        model_in = gather_windows(emb_fr, s, INPUT_N)
        gt = jnp.take(gather_windows(fr, s + INPUT_N, OUTPUT_N), dims, axis=2)

        def loss_fn(p):
            pred = model.apply({"params": p}, model_in, training=True,
                               rngs={"dropout": rng})
            b = pred.shape[0]
            per = jnp.mean(jnp.linalg.norm(
                (gt - pred).reshape(b, -1, 3), axis=-1), axis=-1)
            return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for batch, n_batches in ((50, 200), (512, 60), (2048, 30)):
        starts = jnp.asarray(
            rs.randint(0, n_windows, (n_batches, batch)).astype(np.int32))
        w = jnp.ones((n_batches, batch), jnp.float32)

        @jax.jit
        def epoch(params, opt_state, emb_fr, fr):
            def body(carry, sw):
                p, o, i = carry
                s, ww = sw
                rng = jax.random.fold_in(jax.random.PRNGKey(7), i)
                p, o, loss = step(p, o, rng, emb_fr, fr, s, ww)
                return (p, o, i + 1), loss

            (p, o, _), losses = jax.lax.scan(
                body, (params, opt_state, 0), (starts, w))
            return losses.sum()

        t = timed(lambda: epoch(params, opt_state, embed_frames, frames))
        us = t / n_batches * 1e6
        RESULTS[f"cached_b{batch}_us_per_step"] = us
        print(f"cached b{batch}: {us:.0f} us/step "
              f"({n_batches * batch / t:,.0f} seq/s)", flush=True)
        with open("/tmp/perf_probe6.json", "w") as f:
            json.dump(RESULTS, f, indent=2)


if __name__ == "__main__":
    main()
