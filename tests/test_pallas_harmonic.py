"""Fused harmonic-embed x Dense kernel vs the plain jnp reference (fwd + VJP).

Runs the Pallas interpreter on the CPU conftest; the same code path compiles
with Mosaic on TPU (exercised by bench/probes and the fused Trainer path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionmixerconv_tpu.ops.pallas_harmonic import make_fused_harmonic_dense


def _reference(x2d, kernel, bias, n, omega0):
    freqs = omega0 * (2.0 ** jnp.arange(n, dtype=jnp.float32))
    e = (x2d[..., None] * freqs).reshape(x2d.shape[0], -1)
    embed = jnp.concatenate([jnp.sin(e), jnp.cos(e)], axis=-1)
    return embed @ kernel + bias


@pytest.mark.parametrize("rows,d,e,n,tile", [
    (40, 66, 50, 8, 16),   # rows not a tile multiple
    (32, 7, 13, 4, 8),     # odd dims
    (16, 5, 7, 1, 8),      # single harmonic (the peeled-loop edge)
])
def test_fused_forward_matches_reference(rows, d, e, n, tile):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(rows, d).astype(np.float32) * 0.5)
    k = jnp.asarray(rs.randn(2 * n * d, e).astype(np.float32) * 0.05)
    b = jnp.asarray(rs.randn(e).astype(np.float32) * 0.1)
    fn = make_fused_harmonic_dense(d, e, n, 0.1, tile_rows=tile,
                                   interpret=True)
    got = fn(x, k, b)
    want = _reference(x, k, b, n, 0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("n", [6, 1])
def test_fused_vjp_matches_reference(n):
    rows, d, e = 24, 11, 9
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(rows, d).astype(np.float32) * 0.5)
    k = jnp.asarray(rs.randn(2 * n * d, e).astype(np.float32) * 0.05)
    b = jnp.asarray(rs.randn(e).astype(np.float32) * 0.1)
    tgt = jnp.asarray(rs.randn(rows, e).astype(np.float32))
    fn = make_fused_harmonic_dense(d, e, n, 0.1, tile_rows=8, interpret=True)

    def loss_fused(x, k, b):
        return jnp.sum((fn(x, k, b) - tgt) ** 2)

    def loss_ref(x, k, b):
        return jnp.sum((_reference(x, k, b, n, 0.1) - tgt) ** 2)

    gx, gk, gb = jax.grad(loss_fused, argnums=(0, 1, 2))(x, k, b)
    rx, rk, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    for got, want, name in ((gx, rx, "dx"), (gk, rk, "dW"), (gb, rb, "db")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-4,
            err_msg=name,
        )


def test_fused_under_jit_and_scan():
    """The production shape: the kernel inside a jitted lax.scan step."""
    rows, d, e, n = 16, 6, 5, 3
    rs = np.random.RandomState(2)
    xs = jnp.asarray(rs.randn(4, rows, d).astype(np.float32) * 0.5)
    k = jnp.asarray(rs.randn(2 * n * d, e).astype(np.float32) * 0.05)
    b = jnp.zeros((e,), jnp.float32)
    fn = make_fused_harmonic_dense(d, e, n, 0.1, tile_rows=8, interpret=True)

    @jax.jit
    def total(k, b):
        def step(c, x):
            return c, fn(x, k, b).sum()
        _, out = jax.lax.scan(step, 0.0, xs)
        return out.sum()

    got = total(k, b)
    want = sum(_reference(xs[i], k, b, n, 0.1).sum() for i in range(4))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    g = jax.grad(total)(k, b)
    assert np.all(np.isfinite(np.asarray(g)))


def test_fused_encoder_model_parity():
    """ConvMixer(encoder_fused=True) == plain model: same param tree, same
    forward, same train-step gradients (interpret mode on CPU)."""
    from motionmixerconv_tpu.models import ConvMixer

    kw = dict(
        num_blocks=2, dimPosIn=12, dimPosEmb=16, dimPosOut=12, in_nTP=5,
        out_nTP=7, conv_nChan=1, conv1_kernel_shape=(1, 3),
        conv1_stride=(1, 1), conv1_padding=(0, 1), mode_conv="twice",
        activation="mish", regularization=0.0, use_se=True, r_se=4,
        encoder_n_harmonic_functions=6, encoder_omega0=0.1,
    )
    plain = ConvMixer(**kw)
    fused = ConvMixer(**kw, encoder_fused=True)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(9, 5, 12).astype(np.float32) * 0.4)
    vp = plain.init(jax.random.PRNGKey(0), x, training=False)
    vf = fused.init(jax.random.PRNGKey(0), x, training=False)
    # identical param trees (same names, shapes, AND values: same init draws)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        vp, vf)

    yp = plain.apply(vp, x, training=False)
    yf = fused.apply(vp, x, training=False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp), atol=2e-5)

    tgt = jnp.asarray(rs.randn(9, 7, 12).astype(np.float32))

    def loss(model, v):
        return jnp.mean((model.apply(v, x, training=False) - tgt) ** 2)

    gp = jax.grad(lambda v: loss(plain, v))(vp)
    gf = jax.grad(lambda v: loss(fused, v))(vp)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gf)}
    for k, v in flat_p:
        ks = jax.tree_util.keystr(k)
        scale = max(float(np.abs(np.asarray(v)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(flat_f[ks]), np.asarray(v), atol=5e-5 * scale + 1e-7,
            err_msg=ks)


def test_precomputed_encoder_model_parity():
    """ConvMixer(encoder_precomputed=True) fed PoseEncoder.harmonic_features
    of the input == plain model on the raw input (bit-identical trig, just
    hoisted out of the model)."""
    from motionmixerconv_tpu.models import ConvMixer, PoseEncoder

    kw = dict(
        num_blocks=2, dimPosIn=12, dimPosEmb=16, dimPosOut=12, in_nTP=5,
        out_nTP=7, conv_nChan=1, conv1_kernel_shape=(1, 3),
        conv1_stride=(1, 1), conv1_padding=(0, 1), mode_conv="twice",
        activation="mish", regularization=0.0, use_se=True, r_se=4,
        encoder_n_harmonic_functions=6, encoder_omega0=0.1,
    )
    plain = ConvMixer(**kw)
    pre = ConvMixer(**kw, encoder_precomputed=True)
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(9, 5, 12).astype(np.float32) * 0.4)
    v = plain.init(jax.random.PRNGKey(0), x, training=False)
    emb = PoseEncoder.harmonic_features(x, 6, 0.1)
    # same param tree works for both (encoder params are unchanged)
    vp = pre.init(jax.random.PRNGKey(0), emb, training=False)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v, vp)
    yp = plain.apply(v, x, training=False)
    yc = pre.apply(v, emb, training=False)
    np.testing.assert_array_equal(np.asarray(yc), np.asarray(yp))


def _reference_doubling(x2d, kernel, bias, n, omega0):
    from motionmixerconv_tpu.models.encoding import PoseEncoder

    embed = PoseEncoder.harmonic_features(x2d, n, omega0, impl="doubling")
    return embed @ kernel + bias


@pytest.mark.parametrize("rows,d,e,n,tile", [
    (40, 66, 50, 8, 16),
    (32, 7, 13, 4, 8),
    (16, 5, 7, 1, 8),      # single harmonic: fori_loop body never runs
])
def test_fused_doubling_forward_matches_xla_doubling(rows, d, e, n, tile):
    """impl='doubling' kernel == the XLA doubling twin (same recurrence,
    same normalization, just fused into the projection)."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(rows, d).astype(np.float32) * 0.5)
    k = jnp.asarray(rs.randn(2 * n * d, e).astype(np.float32) * 0.05)
    b = jnp.asarray(rs.randn(e).astype(np.float32) * 0.1)
    fn = make_fused_harmonic_dense(d, e, n, 0.1, tile_rows=tile,
                                   interpret=True, impl="doubling")
    got = fn(x, k, b)
    want = _reference_doubling(x, k, b, n, 0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_fused_doubling_matches_direct_in_signal_band():
    """At low harmonic counts (all angles small) doubling == direct trig to
    f32 tolerance — the two kernels are interchangeable wherever direct
    trig itself carries signal."""
    rows, d, e, n = 24, 11, 9, 6
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(rows, d).astype(np.float32) * 0.5)
    k = jnp.asarray(rs.randn(2 * n * d, e).astype(np.float32) * 0.05)
    b = jnp.asarray(rs.randn(e).astype(np.float32) * 0.1)
    direct = make_fused_harmonic_dense(d, e, n, 0.1, tile_rows=8,
                                       interpret=True)(x, k, b)
    doubling = make_fused_harmonic_dense(d, e, n, 0.1, tile_rows=8,
                                         interpret=True,
                                         impl="doubling")(x, k, b)
    np.testing.assert_allclose(np.asarray(doubling), np.asarray(direct),
                               atol=5e-5)


@pytest.mark.parametrize("n", [6, 1])
def test_fused_doubling_vjp(n):
    """dW/db match autodiff of the XLA doubling twin (identical embed
    values -> identical weight gradients); dx matches the analytic
    d sin(f x)/dx = f cos(f x) formula evaluated at the recurrence's own
    (s, c) — the same formula the direct kernel uses."""
    rows, d, e = 24, 11, 9
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(rows, d).astype(np.float32) * 0.5)
    k = jnp.asarray(rs.randn(2 * n * d, e).astype(np.float32) * 0.05)
    b = jnp.asarray(rs.randn(e).astype(np.float32) * 0.1)
    tgt = jnp.asarray(rs.randn(rows, e).astype(np.float32))
    fn = make_fused_harmonic_dense(d, e, n, 0.1, tile_rows=8, interpret=True,
                                   impl="doubling")

    def loss_fused(x, k, b):
        return jnp.sum((fn(x, k, b) - tgt) ** 2)

    def loss_ref(x, k, b):
        return jnp.sum((_reference_doubling(x, k, b, n, 0.1) - tgt) ** 2)

    gx, gk, gb = jax.grad(loss_fused, argnums=(0, 1, 2))(x, k, b)
    rx, rk, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=5e-4,
                               rtol=1e-4, err_msg="dW")
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=5e-4,
                               rtol=1e-4, err_msg="db")
    # dx: the analytic gradient (what the direct kernel also computes).
    # At n=6 every angle is small, so autodiff-through-the-recurrence and
    # the analytic formula agree to f32 tolerance.
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=5e-3,
                               rtol=1e-3, err_msg="dx")


def test_fused_doubling_model_parity():
    """ConvMixer(encoder_fused=True, encoder_harmonic_impl='doubling') ==
    the plain XLA doubling model: same params, same forward, same grads."""
    from motionmixerconv_tpu.models import ConvMixer

    kw = dict(
        num_blocks=2, dimPosIn=12, dimPosEmb=16, dimPosOut=12, in_nTP=5,
        out_nTP=7, conv_nChan=1, conv1_kernel_shape=(1, 3),
        conv1_stride=(1, 1), conv1_padding=(0, 1), mode_conv="twice",
        activation="mish", regularization=0.0, use_se=True, r_se=4,
        encoder_n_harmonic_functions=6, encoder_omega0=0.1,
        encoder_harmonic_impl="doubling",
    )
    plain = ConvMixer(**kw)
    fused = ConvMixer(**kw, encoder_fused=True)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(9, 5, 12).astype(np.float32) * 0.4)
    vp = plain.init(jax.random.PRNGKey(0), x, training=False)
    vf = fused.init(jax.random.PRNGKey(0), x, training=False)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        vp, vf)

    yp = plain.apply(vp, x, training=False)
    yf = fused.apply(vp, x, training=False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp), atol=2e-5)

    tgt = jnp.asarray(rs.randn(9, 7, 12).astype(np.float32))

    def loss(model, v):
        return jnp.mean((model.apply(v, x, training=False) - tgt) ** 2)

    gp = jax.grad(lambda v: loss(plain, v))(vp)
    gf = jax.grad(lambda v: loss(fused, v))(vp)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gf)}
    for k, v in jax.tree_util.tree_leaves_with_path(gp):
        ks = jax.tree_util.keystr(k)
        scale = max(float(np.abs(np.asarray(v)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(flat_f[ks]), np.asarray(v), atol=1e-4 * scale + 3e-7,
            err_msg=ks)
