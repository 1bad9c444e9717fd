"""Probe 7: size the train-step-fusion prize at small batch.

At b50 the scan step costs ~455 us for ~1 GFLOP — op-dispatch overhead, not
compute. This probe measures, inside the SAME scan-over-batches shape:
  - plain XLA forward (inference mode)
  - the fused single-channel ConvMixer forward kernel (serving kernel)
at b50/b512, plus the full train step for reference. If the fused forward
is substantially faster in-scan, a fwd+bwd fused train-step kernel is worth
building; if not, the op-overhead floor is scan-amortized already.
Writes /tmp/perf_probe7.json.
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
from motionmixerconv_tpu.ops.pallas_conv_mixer import make_fused_conv_mixer

INPUT_N, OUTPUT_N = 10, 25
SEQ_LEN = INPUT_N + OUTPUT_N
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


def main():
    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.randn(N_FRAMES, 96) * 300.0).astype(np.float32))
    n_windows = N_FRAMES - SEQ_LEN
    dims = jnp.asarray(H36M_DIM_USED_XYZ)

    model = ConvMixer(
        num_blocks=4, dimPosIn=66, dimPosEmb=50, dimPosOut=66,
        in_nTP=INPUT_N, out_nTP=OUTPUT_N, conv_nChan=1,
        conv1_kernel_shape=(1, 3), conv1_stride=(1, 1), conv1_padding=(0, 1),
        mode_conv="twice", activation="mish", regularization=0.1, use_se=True,
        r_se=8, use_max_pooling=False, encoder_n_harmonic_functions=64,
        encoder_omega0=0.1,
    )
    x0 = jnp.zeros((8, INPUT_N, 66), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, training=False)
    fused = make_fused_conv_mixer(model, variables)

    for batch, n_batches in ((50, 200), (512, 60)):
        starts = jnp.asarray(
            rs.randint(0, n_windows, (n_batches, batch)).astype(np.int32))
        w = jnp.ones((n_batches, batch), jnp.float32)
        row = {}

        def get_x(s):
            b = gather_windows(frames, s, SEQ_LEN)
            return jnp.take(b, dims, axis=2)[:, :INPUT_N] * 1e-3

        @jax.jit
        def ep_plain(v):
            def step(c, sw):
                s, _ = sw
                return c, model.apply(v, get_x(s), training=False).sum()
            _, out = jax.lax.scan(step, 0.0, (starts, w))
            return out.sum()

        @jax.jit
        def ep_fused():
            def step(c, sw):
                s, _ = sw
                return c, fused(get_x(s)).sum()
            _, out = jax.lax.scan(step, 0.0, (starts, w))
            return out.sum()

        row["plain_fwd_us"] = timed(ep_plain, variables) / n_batches * 1e6
        row["fused_fwd_us"] = timed(ep_fused) / n_batches * 1e6
        row["speedup"] = row["plain_fwd_us"] / row["fused_fwd_us"]
        print(f"b{batch}: plain fwd {row['plain_fwd_us']:.0f} us/step, "
              f"fused fwd {row['fused_fwd_us']:.0f} us/step "
              f"({row['speedup']:.2f}x)", flush=True)
        RESULTS[f"b{batch}"] = row
        with open("/tmp/perf_probe7.json", "w") as f:
            json.dump(RESULTS, f, indent=2)


if __name__ == "__main__":
    main()
