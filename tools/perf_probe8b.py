"""Probe 8b: conv chain FWD+BWD — XLA conv vs block-Toeplitz matmul.

Probe 8 showed the AR step's backward is ~8.6x its forward; the suspected
culprit is conv-backprop-filter at C=8 (64 output elements per (5,5) tap —
MXU-starved). The Toeplitz matmul form is 2.2x slower FORWARD but its
backward is two big (E*C)-wide matmuls; this probe measures
value_and_grad of the same 8-conv chain both ways, in-scan, per-rep-synced.
Writes /tmp/perf_probe8b.json.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B, T, E, C = 50, 10, 192, 8
KH, KW = 5, 5
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
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def toeplitz_weights(w):
    eye = jnp.eye(E, dtype=w.dtype)
    mats = []
    for dt in range(KH):
        acc = jnp.zeros((E * C, E * C), w.dtype)
        for de in range(KW):
            off = de - KW // 2
            d = jnp.roll(eye, -off, axis=1) if off else eye
            if off > 0:
                d = d * (jnp.arange(E)[None, :] < E - off)
            elif off < 0:
                d = d * (jnp.arange(E)[None, :] >= -off)
            acc = acc + jnp.kron(d, w[dt, de])
        mats.append(acc)
    return jnp.stack(mats)


def conv_toeplitz(x, wt):
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
    ws = jnp.asarray(rs.randn(8, KH, KW, C, C).astype(np.float32) * 0.05)
    n_iter = 30

    def chain(apply_w, x, ws):
        y = x
        for i in range(8):
            y = jnp.tanh(apply_w(y, ws[i]))  # nonlinearity between convs
        return y

    @jax.jit
    def scan_conv_grad(x, ws):
        def loss(ws_):
            def step(c, _):
                y = chain(conv_ref, c, ws_)
                return y, y.sum()
            _, out = jax.lax.scan(step, x, jnp.arange(n_iter))
            return out.sum()
        l, g = jax.value_and_grad(loss)(ws)
        return l + g.sum()

    @jax.jit
    def scan_toep_grad(x, ws):
        def loss(ws_):
            wts = jnp.stack([toeplitz_weights(ws_[i]) for i in range(8)])
            def step(c, _):
                y = chain(conv_toeplitz, c, wts)
                return y, y.sum()
            _, out = jax.lax.scan(step, x, jnp.arange(n_iter))
            return out.sum()
        l, g = jax.value_and_grad(loss)(ws)
        return l + g.sum()

    t_conv = timed(scan_conv_grad, x, ws) / n_iter * 1e6
    t_toep = timed(scan_toep_grad, x, ws) / n_iter * 1e6
    RESULTS["conv_grad_us"] = t_conv
    RESULTS["toeplitz_grad_us"] = t_toep
    RESULTS["grad_speedup"] = t_conv / t_toep
    print(f"fwd+bwd 8x(5,5)C8: xla-conv {t_conv:.0f} us, toeplitz "
          f"{t_toep:.0f} us ({t_conv / t_toep:.2f}x)", flush=True)
    with open("/tmp/perf_probe8b.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


if __name__ == "__main__":
    main()
