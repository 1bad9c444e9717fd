"""CLI flag-surface parity: defaults must match the reference scripts.

Reference defaults transcribed from h36m/train_mixer_h36m.py:500-552 (incl.
the two-stage per-loss-type hyperparameter groups), train_autoreg_mixer_h36m
and amass/train_mixer_amass.py:203-267.
"""

from motionmixerconv_tpu.cli import (
    test_mixer_h36m,
    train_autoreg_mixer_ais,
    train_autoreg_mixer_h36m,
    train_mixer_amass,
    train_mixer_h36m,
)


def test_h36m_mpjpe_stage_defaults():
    a = train_mixer_h36m.parse_args(["--loss_type", "mpjpe"])
    # train_mixer_h36m.py:529-539
    assert (a.hidden_dim, a.num_blocks, a.tokens_mlp_dim, a.channels_mlp_dim) == (50, 4, 20, 50)
    assert a.regularization == 0.1 and a.pose_dim == 66 and a.lr == 0.001
    assert a.delta_x is False


def test_h36m_angle_stage_defaults():
    a = train_mixer_h36m.parse_args([])  # default loss_type is 'angle' (:524)
    assert a.loss_type == "angle"
    # train_mixer_h36m.py:541-552
    assert (a.hidden_dim, a.num_blocks, a.tokens_mlp_dim, a.channels_mlp_dim) == (60, 3, 40, 60)
    assert a.regularization == 0.0 and a.pose_dim == 48 and a.lr == 1e-2


def test_h36m_shared_defaults():
    a = train_mixer_h36m.parse_args([])
    # train_mixer_h36m.py:500-524
    assert (a.input_n, a.output_n, a.skip_rate) == (10, 25, 1)
    assert a.activation == "mish" and a.r_se == 8
    assert a.batch_size == 50 and a.batch_size_test == 256
    assert a.milestones == [15, 25, 35, 40] and a.gamma == 0.1
    assert a.use_scheduler is True and a.clip_grad is None
    assert a.actions_to_consider == "all"


def test_h36m_angle_delta_x_rejected():
    import pytest

    with pytest.raises(ValueError):
        train_mixer_h36m.parse_args(["--loss_type", "angle", "--delta_x", "1"])


def test_autoreg_defaults():
    a = train_autoreg_mixer_h36m.parse_args([])
    assert (a.input_n_dataset, a.output_n_dataset) == (10, 25)
    assert (a.input_n_model, a.output_n_model, a.step_window) == (10, 5, 5)
    # harmonic encoding disabled for rollout training
    # (train_autoreg_mixer_h36m.py:535)
    assert a.encoder_n_harmonic_functions == 0
    # autoreg CLI uses (5,5) conv kernels (train_autoreg_mixer_h36m.py:528-548)
    assert (a.kernel1_x, a.kernel1_y) == (5, 5)
    # stage-2 mpjpe defaults (train_autoreg_mixer_h36m.py:486-494);
    # channels_mlp_dim=8 feeds ConvMixer's conv_nChan (:541)
    assert (a.hidden_dim, a.num_blocks, a.conv_nChan) == (192, 4, 8)
    assert a.regularization == -1.0 and a.pose_dim == 66 and a.lr == 0.001
    assert a.n_epochs == 50 and a.batch_size_test == 50
    # reference CLI never defines the TF flag (crashes at :122); the Optuna
    # driver default is 5 (conv_optuna_autoregressive.py:73)
    assert a.n_epochs_teacher_forcing == 5

    b = train_autoreg_mixer_h36m.parse_args(["--loss_type", "angle"])
    # stage-2 angle defaults (train_autoreg_mixer_h36m.py:497-507)
    assert (b.hidden_dim, b.num_blocks, b.conv_nChan) == (60, 3, 60)
    assert b.regularization == 0.0 and b.pose_dim == 48 and b.lr == 1e-2


def test_ais_autoreg_defaults():
    a = train_autoreg_mixer_ais.parse_args([])
    assert a.encoder_n_harmonic_functions == 0
    assert a.pose_dim == 33 and a.skip_rate == 2 and a.smoothing_alpha == 0.15


def test_amass_defaults():
    a = train_mixer_amass.parse_args([])
    # amass/train_mixer_amass.py:206-263
    assert (a.input_n, a.output_n, a.skip_rate) == (10, 25, 1)
    assert a.activation == "gelu" and a.batch_size == 200 and a.n_epochs == 50
    assert (a.hidden_dim, a.num_blocks, a.channels_mlp_dim) == (128, 5, 128)
    assert a.pose_dim == 54 and a.lr == 0.001


def test_pretrained_eval_defaults():
    a = test_mixer_h36m.parse_args(["--model_path", "x.pt"])
    # test_mixer_h36m.py:20,40 — per-horizon frames and delta_x default True
    assert test_mixer_h36m.EVAL_FRAMES == [1, 3, 7, 9, 13, 17, 21, 24]
    assert test_mixer_h36m.IDX_EVAL == 7
    assert a.delta_x is True


def test_h36m_extension_flags_reach_the_model():
    """The TPU-side extension flags (--fused_encoder, --harmonic_impl,
    --embed_dtype) must thread through build_conv_mixer, not just parse."""
    import jax.numpy as jnp

    from motionmixerconv_tpu.cli._runner import build_conv_mixer

    a = train_mixer_h36m.parse_args(
        ["--loss_type", "mpjpe", "--fused_encoder",
         "--harmonic_impl", "doubling", "--embed_dtype", "bf16"])
    m = build_conv_mixer(a, dim_in=66, dim_out=66, in_ntp=10, out_ntp=25)
    assert m.encoder_fused is True
    assert m.encoder_harmonic_impl == "doubling"
    assert m.encoder_embed_dtype == jnp.bfloat16
    # defaults: all three off
    d = build_conv_mixer(
        train_mixer_h36m.parse_args(["--loss_type", "mpjpe"]),
        dim_in=66, dim_out=66, in_ntp=10, out_ntp=25)
    assert d.encoder_fused is False
    assert d.encoder_harmonic_impl == "direct"
    assert d.encoder_embed_dtype is None
