"""Probe 5: honest serving-kernel latency — fused Pallas vs jitted XLA.

Chained dependency timing (each call consumes the previous output, one
final sync) = device-only latency, free of the testbed's ~29 ms relay RTT;
the per-call-synced number is what a same-host client observes. Covers the
MlpMixer fused kernel and both ConvMixer fused kernels at serving batches.
Writes /tmp/perf_probe5.json.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from motionmixerconv_tpu.models import ConvMixer, MlpMixer

RESULTS = {}


def chained_ms(fn, x, n=100):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(y) if y.shape == x.shape else fn(x)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / n * 1e3


def bench_pair(name, model, variables, fused, batches):
    plain = jax.jit(lambda v, x: model.apply(v, x, training=False))
    row = {}
    for b in batches:
        rs = np.random.RandomState(b)
        in_n = getattr(model, "in_nTP", getattr(model, "seq_len", 10))
        d = getattr(model, "dimPosIn", getattr(model, "input_size", 66))
        x = jnp.asarray(rs.randn(b, in_n, d).astype(np.float32) * 0.5)
        t_plain = chained_ms(lambda a: plain(variables, a), x)
        t_fused = chained_ms(fused, x)
        row[f"b{b}"] = {"plain_ms": t_plain, "fused_ms": t_fused,
                        "speedup": t_plain / t_fused}
        print(f"{name} b{b}: plain {t_plain:.3f} ms, fused {t_fused:.3f} ms "
              f"({t_plain / t_fused:.2f}x)", flush=True)
    RESULTS[name] = row
    with open("/tmp/perf_probe5.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def main():
    rs = np.random.RandomState(0)

    # multi-channel ConvMixer (study shape) — lane-matmul kernel
    from motionmixerconv_tpu.ops.pallas_conv_mixer import make_fused_conv_mixer

    mc = ConvMixer(
        num_blocks=6, dimPosIn=66, dimPosEmb=192, dimPosOut=66, in_nTP=10,
        out_nTP=10, conv_nChan=8, conv1_kernel_shape=(5, 9),
        conv1_stride=(1, 1), conv1_padding=None, mode_conv="once",
        activation="gelu", regularization=0.1, use_se=True, r_se=8,
        use_max_pooling=False, encoder_n_harmonic_functions=0,
        encoder_omega0=0.1,
    )
    x0 = jnp.asarray(rs.randn(8, 10, 66).astype(np.float32))
    vmc = mc.init(jax.random.PRNGKey(0), x0, training=False)
    bench_pair("conv_mc", mc, vmc, make_fused_conv_mixer(mc, vmc), (8, 32))

    # single-channel flagship ConvMixer — roll-stencil kernel
    sc = ConvMixer(
        num_blocks=4, dimPosIn=66, dimPosEmb=50, dimPosOut=66, in_nTP=10,
        out_nTP=25, conv_nChan=1, conv1_kernel_shape=(1, 3),
        conv1_stride=(1, 1), conv1_padding=(0, 1), mode_conv="twice",
        activation="mish", regularization=0.1, use_se=True, r_se=8,
        use_max_pooling=False, encoder_n_harmonic_functions=64,
        encoder_omega0=0.1,
    )
    vsc = sc.init(jax.random.PRNGKey(1), x0, training=False)
    bench_pair("conv_sc", sc, vsc, make_fused_conv_mixer(sc, vsc), (8, 32))

    # MlpMixer (AMASS shape) — whole-model kernel
    from motionmixerconv_tpu.ops.pallas_mixer import FusedMlpMixer

    mlp = MlpMixer(
        num_classes=54, num_blocks=5, hidden_dim=128, tokens_mlp_dim=20,
        channels_mlp_dim=128, seq_len=10, pred_len=25, activation="gelu",
        regularization=0.1, input_size=54, r_se=8, use_se=True,
    )
    x54 = jnp.asarray(rs.randn(8, 10, 54).astype(np.float32))
    vm = mlp.init(jax.random.PRNGKey(2), x54, training=False)
    bench_pair("mlp", mlp, vm, FusedMlpMixer(mlp, vm), (8, 32, 128))


if __name__ == "__main__":
    main()
