"""Numeric parity tests: flax models vs reference torch models.

Each fixture stores a torch state_dict (``sd::``-prefixed keys), an input and
the reference's eval-mode output; the test maps the state_dict into the flax
variable tree (models/torch_io.py) and compares forward passes.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionmixerconv_tpu.models import (
    ConvMixer,
    MlpMixer,
    convert_conv_mixer,
    convert_mlp_mixer,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load_case(name):
    data = np.load(os.path.join(GOLDEN, name))
    sd = {k[4:]: data[k] for k in data.files if k.startswith("sd::")}
    return sd, data["x"], data["out"]


class TestMlpMixerParity:
    def test_mpjpe_config(self):
        sd, x, want = _load_case("model_mlp_mixer.npz")
        model = MlpMixer(
            num_classes=66, num_blocks=2, hidden_dim=50, tokens_mlp_dim=20,
            channels_mlp_dim=50, seq_len=10, pred_len=25, activation="mish",
            regularization=0.1, input_size=66, r_se=8, use_se=True,
        )
        variables = convert_mlp_mixer(sd, num_blocks=2)
        got = model.apply(variables, jnp.asarray(x), training=False)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_batchnorm_config(self):
        sd, x, want = _load_case("model_mlp_mixer_bn.npz")
        model = MlpMixer(
            num_classes=48, num_blocks=2, hidden_dim=60, tokens_mlp_dim=40,
            channels_mlp_dim=60, seq_len=10, pred_len=10, activation="gelu",
            regularization=-1.0, input_size=48, r_se=4, use_se=True,
        )
        variables = convert_mlp_mixer(sd, num_blocks=2)
        got = model.apply(variables, jnp.asarray(x), training=False)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_init_and_param_count(self):
        import jax

        model = MlpMixer(
            num_classes=66, num_blocks=2, hidden_dim=50, tokens_mlp_dim=20,
            channels_mlp_dim=50, seq_len=10, pred_len=25, activation="mish",
            regularization=0.1, input_size=66, r_se=8, use_se=True,
        )
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 10, 66)))
        sd, _, _ = _load_case("model_mlp_mixer.npz")
        n_torch = sum(v.size for v in sd.values())
        n_flax = sum(
            x.size for x in jax.tree_util.tree_leaves(variables["params"])
        )
        assert n_flax == n_torch


class TestConvMixerParity:
    def test_h36m_default_config(self):
        sd, x, want = _load_case("model_conv_mixer.npz")
        model = ConvMixer(
            num_blocks=2, dimPosIn=66, dimPosEmb=50, dimPosOut=66, in_nTP=10,
            out_nTP=25, conv_nChan=1, conv1_kernel_shape=(1, 3),
            conv1_stride=(1, 1), conv1_padding=(0, 1), mode_conv="twice",
            activation="mish", regularization=0.1, use_se=True, r_se=8,
            use_max_pooling=False, encoder_n_harmonic_functions=64,
            encoder_omega0=0.1,
        )
        variables = convert_conv_mixer(sd, num_blocks=2)
        got = model.apply(variables, jnp.asarray(x), training=False)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_multichannel_bn_maxpool(self):
        sd, x, want = _load_case("model_conv_mixer_multichan.npz")
        model = ConvMixer(
            num_blocks=2, dimPosIn=54, dimPosEmb=32, dimPosOut=54, in_nTP=10,
            out_nTP=5, conv_nChan=3, conv1_kernel_shape=(5, 9),
            conv1_stride=None, conv1_padding=None, mode_conv="twice",
            activation="gelu", regularization=-1.0, use_se=True, r_se=4,
            use_max_pooling=True, encoder_n_harmonic_functions=8,
            encoder_omega0=0.1,
        )
        variables = convert_conv_mixer(sd, num_blocks=2)
        got = model.apply(variables, jnp.asarray(x), training=False)
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_mode_conv_once_quirk(self):
        sd, x, want = _load_case("model_conv_mixer_once.npz")
        model = ConvMixer(
            num_blocks=2, dimPosIn=66, dimPosEmb=40, dimPosOut=66, in_nTP=10,
            out_nTP=10, conv_nChan=2, conv1_kernel_shape=(1, 3),
            conv1_padding=None, mode_conv="once", activation="gelu",
            regularization=0.0, use_se=True, r_se=4,
            encoder_n_harmonic_functions=-1,
        )
        variables = convert_conv_mixer(sd, num_blocks=2)
        got = model.apply(variables, jnp.asarray(x), training=False)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_jit_forward(self):
        import jax

        sd, x, want = _load_case("model_conv_mixer.npz")
        model = ConvMixer(
            num_blocks=2, dimPosIn=66, dimPosEmb=50, dimPosOut=66, in_nTP=10,
            out_nTP=25, conv_nChan=1, conv1_kernel_shape=(1, 3),
            conv1_stride=(1, 1), conv1_padding=(0, 1), mode_conv="twice",
            activation="mish", regularization=0.1, use_se=True, r_se=8,
            encoder_n_harmonic_functions=64, encoder_omega0=0.1,
        )
        variables = convert_conv_mixer(sd, num_blocks=2)
        fwd = jax.jit(lambda v, a: model.apply(v, a, training=False))
        got = fwd(variables, jnp.asarray(x))
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_dropout_active_in_training_mode():
    import jax

    model = MlpMixer(
        num_classes=66, num_blocks=1, hidden_dim=50, tokens_mlp_dim=20,
        channels_mlp_dim=50, seq_len=10, pred_len=25, activation="gelu",
        regularization=0.5, input_size=66, use_se=True,
    )
    x = jnp.ones((2, 10, 66))
    variables = model.init(jax.random.PRNGKey(0), x)
    out1 = model.apply(
        variables, x, training=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    out2 = model.apply(
        variables, x, training=True, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(out1, out2)
    # eval mode is deterministic
    e1 = model.apply(variables, x, training=False)
    e2 = model.apply(variables, x, training=False)
    np.testing.assert_array_equal(e1, e2)


def test_bfloat16_compute_dtype():
    """dtype=jnp.bfloat16 runs the whole forward in bf16 (params stay f32,
    so checkpoints are dtype-agnostic) and stays within bf16 tolerance of
    the f32 forward. Trainer losses/metrics cast back to f32."""
    import jax

    kw = dict(
        num_blocks=2, dimPosIn=66, dimPosEmb=50, dimPosOut=66, in_nTP=10,
        out_nTP=25, conv_nChan=1, conv1_kernel_shape=(1, 3),
        conv1_stride=(1, 1), conv1_padding=(0, 1), mode_conv="twice",
        activation="mish", regularization=0.1, use_se=True, r_se=8,
        encoder_n_harmonic_functions=8, encoder_omega0=0.1,
    )
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(6, 10, 66).astype(np.float32) * 0.5)
    m32, m16 = ConvMixer(**kw), ConvMixer(**kw, dtype=jnp.bfloat16)
    variables = m32.init(jax.random.PRNGKey(0), x, training=False)
    # params are f32 regardless of compute dtype
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(variables["params"]))
    y32 = m32.apply(variables, x, training=False)
    y16 = m16.apply(variables, x, training=False)
    assert y16.dtype == jnp.bfloat16
    rel = np.abs(np.asarray(y16, np.float32) - y32).max() / np.abs(y32).max()
    assert rel < 0.05

    mlp = MlpMixer(
        num_classes=54, num_blocks=2, hidden_dim=64, tokens_mlp_dim=20,
        channels_mlp_dim=64, seq_len=10, pred_len=25, activation="gelu",
        regularization=0.1, input_size=54, use_se=True, dtype=jnp.bfloat16,
    )
    x54 = jnp.asarray(rs.randn(6, 10, 54).astype(np.float32) * 0.5)
    vm = mlp.init(jax.random.PRNGKey(1), x54, training=False)
    assert mlp.apply(vm, x54, training=False).dtype == jnp.bfloat16


def test_bfloat16_embed_storage_dtype():
    """encoder_embed_dtype=jnp.bfloat16 stores only the materialized
    harmonic embedding in bf16 (the training step's dominant HBM tensor,
    DESIGN §6); everything else stays f32. Output dtype is f32 and within
    bf16-rounding tolerance of the all-f32 forward; gradients are finite."""
    import jax

    kw = dict(
        num_blocks=2, dimPosIn=66, dimPosEmb=50, dimPosOut=66, in_nTP=10,
        out_nTP=25, conv_nChan=1, conv1_kernel_shape=(1, 3),
        conv1_stride=(1, 1), conv1_padding=(0, 1), mode_conv="twice",
        activation="mish", regularization=0.1, use_se=True, r_se=8,
        encoder_n_harmonic_functions=8, encoder_omega0=0.1,
    )
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(6, 10, 66).astype(np.float32) * 0.5)
    m32 = ConvMixer(**kw)
    m16 = ConvMixer(**kw, encoder_embed_dtype=jnp.bfloat16)
    variables = m32.init(jax.random.PRNGKey(0), x, training=False)
    y32 = m32.apply(variables, x, training=False)
    y16 = m16.apply(variables, x, training=False)
    assert y16.dtype == jnp.float32  # compute stays f32 downstream
    rel = np.abs(np.asarray(y16) - y32).max() / np.abs(y32).max()
    assert 0 < rel < 0.02  # differs (cast is live) but only by bf16 rounding

    def loss(v):
        return jnp.sum(m16.apply(v, x, training=False) ** 2)

    g = jax.grad(loss)(variables)
    assert all(np.all(np.isfinite(np.asarray(p, np.float32)))
               for p in jax.tree_util.tree_leaves(g))


def test_conv_encoder_equals_full_width_conv():
    """Working ConvEncoder re-design: a Conv2d spanning the full feature
    width IS a Dense over features (the reference's conv_encoder.py:4-30
    intent — the module itself crashes on construction). Verified against a
    real torch Conv2d with the same weights."""
    import jax
    import torch

    from motionmixerconv_tpu.models import ConvEncoder

    B, T, D, E, C = 4, 10, 66, 50, 3
    enc = ConvEncoder(dimPosIn=D, dimPosEmb=E, conv_nChan=C)
    rs = np.random.RandomState(7)
    x = rs.randn(B, T, D).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(enc.apply(variables, jnp.asarray(x)))  # (B, T, E, C)
    assert y.shape == (B, T, E, C)

    # torch reference computation with the SAME weights:
    # conv_in: Conv2d(1, E, kernel=(1, D)) on [B,1,T,D] -> [B,E,T,1],
    # channelUpscaling: Linear(1, C) -> [B,E,T,C], transpose -> [B,C,T,E]
    conv = torch.nn.Conv2d(1, E, kernel_size=(1, D))
    lin = torch.nn.Linear(1, C)
    with torch.no_grad():
        w = np.asarray(variables["params"]["embed_mlp"]["kernel"])  # (D, E)
        conv.weight.copy_(torch.from_numpy(w.T.reshape(E, 1, 1, D)))
        conv.bias.copy_(torch.from_numpy(
            np.asarray(variables["params"]["embed_mlp"]["bias"])))
        wu = np.asarray(variables["params"]["channelUpscaling"]["kernel"])
        lin.weight.copy_(torch.from_numpy(wu.T))  # (C, 1)
        lin.bias.copy_(torch.from_numpy(
            np.asarray(variables["params"]["channelUpscaling"]["bias"])))
        yt = conv(torch.from_numpy(x).unsqueeze(1))  # [B, E, T, 1]
        yt = lin(yt).transpose(1, 3)  # [B, C, T, E]
    # our layout is (B, T, E, C) == torch [B, C, T, E] transposed
    np.testing.assert_allclose(
        y, yt.numpy().transpose(0, 2, 3, 1), atol=2e-5
    )


class TestDoublingHarmonics:
    """encoder_harmonic_impl='doubling': the normalized angle-doubling
    recurrence (PoseEncoder._doubling_harmonics). It must agree with the
    direct trig below the f32 noise crossover, stay exactly on the unit
    circle at every harmonic (the unnormalized recurrence overflows to NaN
    past ~28 doublings), and train end-to-end."""

    N, D = 512, 6

    def _x(self):
        rs = np.random.RandomState(0)
        # production scale: mm frames * input_scale 1e-3 -> x ~ N(0, 0.3)
        return jnp.asarray((rs.randn(self.N, self.D) * 0.3).astype(np.float32))

    def test_low_harmonics_match_direct(self):
        from motionmixerconv_tpu.models.encoding import PoseEncoder

        x, n = self._x(), 64
        direct = np.asarray(PoseEncoder.harmonic_features(x, n, 0.1))
        doubling = np.asarray(
            PoseEncoder.harmonic_features(x, n, 0.1, impl="doubling"))
        # layout: [sin(D, n) flattened, cos(D, n) flattened]
        for block in (direct, doubling):
            assert block.shape == (self.N, 2 * n * self.D)
        d = direct.reshape(self.N, 2, self.D, n)
        r = doubling.reshape(self.N, 2, self.D, n)
        # below the crossover both methods carry real signal and must agree;
        # tolerances follow the doubling's own error growth (~2x/harmonic,
        # see `tools/probe.py encoder` and the docstring's error analysis)
        np.testing.assert_allclose(r[..., :8], d[..., :8], atol=1e-4)
        np.testing.assert_allclose(r[..., :16], d[..., :16], atol=5e-2)

    def test_unit_circle_everywhere(self):
        from motionmixerconv_tpu.models.encoding import PoseEncoder

        x, n = self._x(), 64
        emb = np.asarray(
            PoseEncoder.harmonic_features(x, n, 0.1, impl="doubling"))
        assert np.all(np.isfinite(emb))
        e = emb.reshape(self.N, 2, self.D, n)
        radius = e[:, 0] ** 2 + e[:, 1] ** 2  # sin^2 + cos^2 per harmonic
        np.testing.assert_allclose(radius, 1.0, atol=1e-5)

    def test_gradients_finite(self):
        from motionmixerconv_tpu.models.encoding import PoseEncoder

        x = self._x()[:8]

        def f(x):
            return jnp.sum(
                PoseEncoder.harmonic_features(x, 64, 0.1, impl="doubling"))

        g = jax.grad(f)(x)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_unknown_impl_rejected(self):
        from motionmixerconv_tpu.models.encoding import PoseEncoder

        with pytest.raises(ValueError, match="unknown harmonic impl"):
            PoseEncoder.harmonic_features(self._x(), 8, 0.1, impl="nope")

    def test_zero_harmonics_empty_like_direct(self):
        from motionmixerconv_tpu.models.encoding import PoseEncoder

        x = self._x()
        for n in (0, -1):
            d = PoseEncoder.harmonic_features(x, n, 0.1)
            r = PoseEncoder.harmonic_features(x, n, 0.1, impl="doubling")
            assert d.shape == r.shape == (self.N, 0)

    def test_fused_incompatible_with_precomputed(self):
        """fused computes harmonics from RAW input inside the kernel; a
        precomputed (2nD) embedding must be rejected up front, not die in
        a reshape deep inside the kernel wrapper."""
        import jax

        from motionmixerconv_tpu.models.encoding import PoseEncoder

        enc = PoseEncoder(dimPosIn=6, dimPosEmb=8, conv_nChan=1,
                          n_harmonic_functions=4, omega0=0.1,
                          fused=True, precomputed=True)
        with pytest.raises(ValueError, match="fused=True does not combine"):
            enc.init(jax.random.PRNGKey(0),
                     jnp.zeros((2, 10, 2 * 4 * 6), jnp.float32))

    def test_fused_incompatible_with_dtype(self):
        """fused + bf16 must raise, not silently benchmark the XLA path."""
        import jax

        from motionmixerconv_tpu.models.encoding import PoseEncoder

        enc = PoseEncoder(dimPosIn=6, dimPosEmb=8, conv_nChan=1,
                          n_harmonic_functions=4, omega0=0.1,
                          fused=True, dtype=jnp.bfloat16)
        with pytest.raises(ValueError, match="f32-only"):
            enc.init(jax.random.PRNGKey(0), jnp.zeros((2, 10, 6)))

    def test_incompatible_with_precomputed(self):
        from motionmixerconv_tpu.models.encoding import PoseEncoder

        enc = PoseEncoder(dimPosIn=6, dimPosEmb=8,
                          harmonic_impl="doubling", precomputed=True)
        with pytest.raises(ValueError, match="doubling"):
            enc.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 6)))

    def test_embed_dtype_incompatible_with_fused_and_precomputed(self):
        """embed_dtype casts the MATERIALIZED embedding; under fused
        (nothing materialized) or precomputed (cache dtype fixed at
        precompute time) it would be a silent no-op — must raise like
        every other incompatible encoder combination."""
        import jax

        from motionmixerconv_tpu.models.encoding import PoseEncoder

        for kw in (dict(fused=True), dict(precomputed=True)):
            enc = PoseEncoder(dimPosIn=6, dimPosEmb=8, conv_nChan=1,
                              n_harmonic_functions=4, omega0=0.1,
                              embed_dtype=jnp.bfloat16, **kw)
            x = jnp.zeros(
                (2, 10, 2 * 4 * 6 if kw.get("precomputed") else 6),
                jnp.float32)
            with pytest.raises(ValueError, match="embed_dtype only"):
                enc.init(jax.random.PRNGKey(0), x)

    def test_trains_like_direct(self):
        """Same init, same data: 20 train steps with each impl reach the
        same loss to a few percent (the impls differ only in the f32-noise
        harmonics, which neither method computes meaningfully)."""
        from motionmixerconv_tpu.train import Trainer, make_optimizer

        rs = np.random.RandomState(3)
        frames = jnp.asarray((rs.randn(2000, 24) * 300.0).astype(np.float32))
        dim_used = np.arange(18)
        starts = jnp.asarray(
            rs.randint(0, 2000 - 20, size=(20, 32)).astype(np.int32))
        w = jnp.ones((20, 32), jnp.float32)

        losses = {}
        for impl in ("direct", "doubling"):
            model = ConvMixer(
                num_blocks=2, dimPosIn=18, dimPosEmb=16, dimPosOut=18,
                in_nTP=10, out_nTP=10, conv_nChan=1,
                conv1_kernel_shape=(1, 3), conv1_stride=(1, 1),
                conv1_padding=(0, 1), mode_conv="twice", activation="mish",
                regularization=0.0, use_se=True, r_se=4,
                use_max_pooling=False, encoder_n_harmonic_functions=32,
                encoder_omega0=0.1, encoder_harmonic_impl=impl,
            )
            tr = Trainer(model, make_optimizer(lr=1e-3, steps_per_epoch=20),
                         loss_type="mpjpe", dim_used=dim_used,
                         input_n=10, output_n=10, input_scale=1e-3)
            state = tr.init_state(jax.random.PRNGKey(1))
            fn = jax.jit(tr._train_epoch_scan_impl)
            epoch_losses = []
            for _ in range(3):
                state, loss = fn(state, frames, starts, w)
                epoch_losses.append(float(loss))
            losses[impl] = np.asarray(epoch_losses)
        assert np.all(np.isfinite(losses["doubling"]))
        assert losses["doubling"][-1] < losses["doubling"][0]  # it learns
        # same trajectory to a few percent: the impls differ only in the
        # f32-noise harmonics, which neither method computes meaningfully
        np.testing.assert_allclose(losses["doubling"], losses["direct"],
                                   rtol=5e-2)
