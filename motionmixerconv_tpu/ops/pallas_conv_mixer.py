"""Fused ConvMixer core as a single Pallas TPU kernel (serving path).

Split of labor with XLA: the harmonic PoseEncoder ends in the model's only
large matmul (dimHarmonic up to 66*64*2 = 8448 -> dimPosEmb), which XLA
already runs at full MXU efficiency — it stays outside. Everything after —
num_blocks x (LN -> conv stencil -> SE -> residual, twice) -> LN ->
time-upsample -> channel projection -> GELU -> fc_out — is ~30 small ops per
block and fuses into ONE kernel here, with the batch tile and all weights
VMEM-resident.

The (kx, ky) 'same' convolutions (conv_nChan == 1, the reference CLI default,
train_mixer_h36m.py:583) are computed as unrolled tap stencils: each tap is a
lane/sublane roll + wrap mask + fused multiply-add, which is exactly what a
small 'same' conv is on a VPU. torch's 'same' places the extra pad of
even kernels on the right — tap offsets use floor((k-1)/2) left pad to match.

Parity: h36m/conv_mixer_model.py:268-292 (block), :453-465 (decoder), incl.
the shared-SE and 'once'-mode quirks, avg/max-pool SE (:30-36), and
BatchNorm regularization (:113-119 — at inference a per-conv-channel affine,
applied in-kernel as identity-by-default scale/shift rows). Inference only;
this class covers conv_nChan == 1, FusedConvMixerMC covers conv_nChan >= 2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mixer import LANE, _act, _ceil, _pad2, _row


class FusedConvMixer:
    """Padded weights + fused kernel for a conv_nChan=1 flax ConvMixer."""

    def __init__(self, model, variables: dict):
        cfg = model
        if cfg.conv_nChan != 1:
            raise NotImplementedError("fused ConvMixer kernel supports conv_nChan == 1")
        self.model = model
        self.variables = variables
        self.T, self.P = cfg.in_nTP, cfg.out_nTP
        self.E = cfg.dimPosEmb
        self.D_out = cfg.dimPosOut
        self.use_se = cfg.use_se
        self.use_max_pooling = cfg.use_max_pooling
        self.activation = cfg.activation
        self.num_blocks = cfg.num_blocks
        self.mode_twice = cfg.mode_conv == "twice"
        self.Tp = max(_ceil(self.T, 8), 8)
        self.Pp = max(_ceil(self.P, 8), 8)

        k1 = tuple(cfg.conv1_kernel_shape)
        if self.mode_twice:
            k2 = cfg.conv2_kernel_shape or (
                min(k1[1], self.T), min(k1[0], self.E)
            )
        else:
            k2 = (1, 1)
        self.k1, self.k2 = k1, k2

        p = jax.device_get(variables["params"])
        bn = cfg.regularization == -1.0
        stats = jax.device_get(variables["batch_stats"]) if bn else None
        nb = self.num_blocks
        Tp = self.Tp

        def stack(fn, shape):
            return np.stack(
                [fn(p[f"Mixer_Block_{i}"]) for i in range(nb)]
            ).reshape((nb,) + shape)

        def bn_rows(conv_name):
            """Inference BatchNorm (conv_mixer_model.py:113-119) as full-row
            (scale, shift): per-conv-channel affine, scalar at C_out == 1."""
            s_rows = np.ones((nb, 1, LANE), np.float32)
            t_rows = np.zeros((nb, 1, LANE), np.float32)
            if not bn:
                return s_rows, t_rows
            for i in range(nb):
                bp = p[f"Mixer_Block_{i}"][conv_name]["reg"]["BatchNorm_0"]
                bs = stats[f"Mixer_Block_{i}"][conv_name]["reg"]["BatchNorm_0"]
                s = float(bp["scale"][0]) / float(np.sqrt(bs["var"][0] + 1e-5))
                s_rows[i, 0, :] = s
                t_rows[i, 0, :] = float(bp["bias"][0]) - float(bs["mean"][0]) * s
            return s_rows, t_rows

        # conv kernels: flax layout (kh, kw, 1, 1) -> (kh, kw) tap tables;
        # stored flattened to (nb, kh*kw padded to 8, 128) rows for SMEM-free
        # 2-D reads (tap t at [i, t, 0]).
        def conv_taps(bp, name, k):
            w = np.asarray(bp[name]["conv"]["kernel"])[..., 0, 0]  # (kh, kw)
            taps = np.zeros((max(_ceil(k[0] * k[1], 8), 8), LANE), np.float32)
            taps[: k[0] * k[1], 0] = w.reshape(-1)
            return taps

        def conv_bias_row(bp, name):
            # Conv bias is per-output-channel; with C_out == 1 it is a scalar
            # broadcast over every (t, e) position -> full row.
            return np.full((1, LANE), float(np.asarray(bp[name]["conv"]["bias"])[0]),
                           np.float32)

        self.c1_taps = stack(lambda b: conv_taps(b, "conv1", k1),
                             (max(_ceil(k1[0] * k1[1], 8), 8), LANE))
        self.c1_bias = stack(lambda b: conv_bias_row(b, "conv1"), (1, LANE))
        self.ln1_g = stack(lambda b: _row(b["LN1"]["scale"], LANE), (1, LANE))
        self.ln1_b = stack(lambda b: _row(b["LN1"]["bias"], LANE), (1, LANE))
        self.bn1_s, self.bn1_t = bn_rows("conv1")
        if self.mode_twice:
            self.c2_taps = stack(lambda b: conv_taps(b, "conv2", k2),
                                 (max(_ceil(k2[0] * k2[1], 8), 8), LANE))
            self.c2_bias = stack(lambda b: conv_bias_row(b, "conv2"), (1, LANE))
            self.ln2_g = stack(lambda b: _row(b["LN2"]["scale"], LANE), (1, LANE))
            self.ln2_b = stack(lambda b: _row(b["LN2"]["bias"], LANE), (1, LANE))
            self.bn2_s, self.bn2_t = bn_rows("conv2")
        else:
            z = np.zeros_like(self.c1_taps)
            self.c2_taps, self.c2_bias = z, np.zeros_like(self.c1_bias)
            self.ln2_g = np.zeros_like(self.ln1_g)
            self.ln2_b = np.zeros_like(self.ln1_b)
            self.bn2_s = np.ones_like(self.bn1_s)
            self.bn2_t = np.zeros_like(self.bn1_t)
        if self.use_se:
            self.se_w1 = stack(lambda b: _pad2(b["se"]["fc1"]["kernel"], Tp, Tp), (Tp, Tp))
            self.se_w2 = stack(lambda b: _pad2(b["se"]["fc2"]["kernel"], Tp, Tp), (Tp, Tp))
        else:
            self.se_w1 = np.zeros((nb, Tp, Tp), np.float32)
            self.se_w2 = np.zeros((nb, Tp, Tp), np.float32)

        self.g_ln = _row(p["LN"]["scale"], LANE)
        self.b_ln = _row(p["LN"]["bias"], LANE)
        self.w_time = _pad2(p["conv_out"]["kernel"], Tp, self.Pp)
        self.b_time = _row(p["conv_out"]["bias"], self.Pp)
        # project_channels with C=1 is a scalar affine
        self.proj_w = float(np.asarray(p["project_channels"]["kernel"])[0, 0])
        self.proj_b = float(np.asarray(p["project_channels"]["bias"])[0])
        self.w_out = _pad2(p["fc_out"]["kernel"], LANE, LANE)
        self.b_out = _row(p["fc_out"]["bias"], LANE)

        self._weights = [
            self.ln1_g, self.ln1_b, self.c1_taps, self.c1_bias,
            self.bn1_s, self.bn1_t,
            self.ln2_g, self.ln2_b, self.c2_taps, self.c2_bias,
            self.bn2_s, self.bn2_t,
            self.se_w1, self.se_w2,
            self.g_ln, self.b_ln, self.w_time, self.b_time,
            self.w_out, self.b_out,
        ]

        # the XLA-side encoder: PoseEncoder up to (B, T, E), then squeeze C=1
        enc_variables = {"params": {"embed_mlp": p["encoder"]["embed_mlp"],
                                    "channelUpscaling": p["encoder"]["channelUpscaling"]}}
        from ..models.encoding import PoseEncoder

        encoder = PoseEncoder(
            dimPosIn=cfg.dimPosIn, dimPosEmb=cfg.dimPosEmb, conv_nChan=1,
            n_harmonic_functions=cfg.encoder_n_harmonic_functions,
            omega0=cfg.encoder_omega0,
        )
        self._encode = lambda x: encoder.apply(enc_variables, x)[..., 0]

    @functools.partial(jax.jit, static_argnums=(0, 2, 3))
    def _run(self, x: jnp.ndarray, block_b: int, interpret: bool) -> jnp.ndarray:
        b = x.shape[0]
        bp = _ceil(b, block_b)
        y = self._encode(x)  # (B, T, E) — the big matmul stays in XLA
        yp = jnp.zeros((bp, self.Tp, LANE), jnp.float32)
        yp = yp.at[:b, : self.T, : self.E].set(y)

        kernel = functools.partial(
            _conv_mixer_kernel,
            T=self.T, E=self.E, P=self.P, Tp=self.Tp, Pp=self.Pp,
            num_blocks=self.num_blocks, use_se=self.use_se,
            use_max=self.use_max_pooling,
            activation=self.activation, k1=self.k1, k2=self.k2,
            mode_twice=self.mode_twice,
            proj_w=self.proj_w, proj_b=self.proj_b,
        )

        def _const_map(nd):
            return lambda i: (0,) * nd

        in_specs = [
            pl.BlockSpec((block_b, self.Tp, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ] + [
            pl.BlockSpec(w.shape, _const_map(w.ndim), memory_space=pltpu.VMEM)
            for w in self._weights
        ]
        out = pl.pallas_call(
            kernel,
            grid=(bp // block_b,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (block_b, self.Pp, LANE), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((bp, self.Pp, LANE), jnp.float32),
            interpret=interpret,
        )(yp, *[jnp.asarray(w) for w in self._weights])
        return out[:b, : self.P, : self.D_out]

    def __call__(self, x: jnp.ndarray, block_b: int = 32,
                 interpret: bool = False) -> jnp.ndarray:
        block_b = min(block_b, _ceil(x.shape[0], 8))
        return self._run(x, block_b, interpret)


def make_fused_conv_mixer(model, variables: dict):
    """Kernel factory: conv_nChan == 1 -> FusedConvMixer (roll-stencil
    kernel); conv_nChan >= 2 -> FusedConvMixerMC (lane-matmul kernel).
    BatchNorm and avg/max-pool SE configs are supported by both; raises
    NotImplementedError only for conv_nChan * in_nTP > 128."""
    if getattr(model, "conv_nChan", 1) == 1:
        return FusedConvMixer(model, variables)
    return FusedConvMixerMC(model, variables)


class FusedConvMixerMC:
    """Fused multi-channel ConvMixer (the study's conv_nChan=8 shape).

    Layout: activations live as (batch, Ep, R) — embedding E on sublanes,
    R = conv_nChan * in_nTP fused (channel, time) pairs on lanes. In this
    layout each 'same' Conv2d over (T, E) with full C_in x C_out channel
    mixing (reference ConvBlock, h36m/conv_mixer_model.py:101-142) becomes
    kw MXU matmuls: for each E-offset the (time-shift x channel-mix) part of
    the kernel is folded into one precomputed (R, R) block-Toeplitz matrix
    M_de[ci*T + t + dt - ph, co*T + t] = w[dt, de, ci, co], and the E-shift
    is a sublane roll. No per-tap scalar stencils, so kernels as large as
    the study's (9, 29) compile to 29 matmuls instead of 9*29*64 FMAs.

    Per-block weights stream HBM->VMEM through a (batch_tiles, num_blocks)
    grid (the mix matrices for all 6 study blocks would not fit VMEM at
    once); the activation carries across block steps in VMEM scratch.

    Constraints: conv_nChan * in_nTP <= 128. BatchNorm (per-channel affine
    lane rows) and avg/max-pool SE are supported. Inference only, like
    FusedConvMixer.
    """

    def __init__(self, model, variables: dict):
        cfg = model
        self.C = cfg.conv_nChan
        self.T, self.P = cfg.in_nTP, cfg.out_nTP
        self.E = cfg.dimPosEmb
        self.R = self.C * self.T
        if self.R > LANE:
            raise NotImplementedError(
                f"fused MC kernel needs conv_nChan*in_nTP <= {LANE}, got {self.R}"
            )
        self.model = model
        self.variables = variables
        self.D_out = cfg.dimPosOut
        self.use_se = cfg.use_se
        self.use_max_pooling = cfg.use_max_pooling
        self.activation = cfg.activation
        self.num_blocks = cfg.num_blocks
        self.mode_twice = cfg.mode_conv == "twice"
        self.Ep = max(_ceil(self.E, LANE), LANE)
        self.Pp = LANE  # decoder P lanes, padded

        k1 = tuple(cfg.conv1_kernel_shape)
        k2 = (cfg.conv2_kernel_shape or (min(k1[1], self.T), min(k1[0], self.E))) \
            if self.mode_twice else (1, 1)
        self.k1, self.k2 = k1, k2

        p = jax.device_get(variables["params"])
        bn = cfg.regularization == -1.0
        stats = jax.device_get(variables["batch_stats"]) if bn else None
        nb, C, T, E, R, Ep = (self.num_blocks, self.C, self.T, self.E,
                              self.R, self.Ep)

        def mix_matrices(w, kh, kw):
            """flax HWIO conv kernel -> (kw, R, R) lane-mix matrices."""
            M = np.zeros((kw, LANE, LANE), np.float32)
            t_out = np.arange(T)
            for de in range(kw):
                for dt in range(kh):
                    t_in = t_out + dt - (kh - 1) // 2
                    ok = (t_in >= 0) & (t_in < T)
                    for ci in range(C):
                        for co in range(C):
                            M[de, ci * T + t_in[ok], co * T + t_out[ok]] += \
                                float(w[dt, de, ci, co])
            return M

        def bias_lanes(b):
            """per-C_out conv bias -> (1, R->LANE) lane vector (b[r // T])."""
            v = np.zeros((1, LANE), np.float32)
            v[0, :R] = np.repeat(np.asarray(b, np.float32), T)
            return v

        def ln_plane(v):
            """per-E LN param -> (Ep, LANE) sublane plane (replicated lanes)."""
            out = np.zeros((Ep, LANE), np.float32)
            out[:E, :] = np.asarray(v, np.float32)[:, None]
            return out

        def stack(fn):
            return np.stack([fn(p[f"Mixer_Block_{i}"]) for i in range(nb)])

        def bn_lane_rows(conv_name):
            """Inference BatchNorm as (scale, shift) lane vectors: the
            per-conv-channel affine repeats over the T lanes of each channel
            group (lane r belongs to channel r // T)."""
            s_rows = np.ones((nb, 1, LANE), np.float32)
            t_rows = np.zeros((nb, 1, LANE), np.float32)
            if not bn:
                return s_rows, t_rows
            for i in range(nb):
                bp = p[f"Mixer_Block_{i}"][conv_name]["reg"]["BatchNorm_0"]
                bs = stats[f"Mixer_Block_{i}"][conv_name]["reg"]["BatchNorm_0"]
                s = np.asarray(bp["scale"], np.float32) / np.sqrt(
                    np.asarray(bs["var"], np.float32) + 1e-5)
                t = np.asarray(bp["bias"], np.float32) - \
                    np.asarray(bs["mean"], np.float32) * s
                s_rows[i, 0, :R] = np.repeat(s, T)
                t_rows[i, 0, :R] = np.repeat(t, T)
            return s_rows, t_rows

        self.c1_mix = stack(lambda bp: mix_matrices(
            np.asarray(bp["conv1"]["conv"]["kernel"]), k1[0], k1[1]))
        self.c1_bias = stack(lambda bp: bias_lanes(bp["conv1"]["conv"]["bias"]))
        self.ln1_g = stack(lambda bp: ln_plane(bp["LN1"]["scale"]))
        self.ln1_b = stack(lambda bp: ln_plane(bp["LN1"]["bias"]))
        self.bn1_s, self.bn1_t = bn_lane_rows("conv1")
        if self.mode_twice:
            self.c2_mix = stack(lambda bp: mix_matrices(
                np.asarray(bp["conv2"]["conv"]["kernel"]), k2[0], k2[1]))
            self.c2_bias = stack(lambda bp: bias_lanes(bp["conv2"]["conv"]["bias"]))
            self.ln2_g = stack(lambda bp: ln_plane(bp["LN2"]["scale"]))
            self.ln2_b = stack(lambda bp: ln_plane(bp["LN2"]["bias"]))
            self.bn2_s, self.bn2_t = bn_lane_rows("conv2")
        else:
            self.c2_mix = np.zeros((nb, 1, LANE, LANE), np.float32)
            self.c2_bias = np.zeros_like(self.c1_bias)
            self.ln2_g = np.zeros_like(self.ln1_g)
            self.ln2_b = np.zeros_like(self.ln1_b)
            self.bn2_s = np.ones_like(self.bn1_s)
            self.bn2_t = np.zeros_like(self.bn1_t)

        # SE: squeeze matrix G sums each t's lanes over channels (x 1/(E*C)),
        # H scatters the (T,) gate back to (R,) lanes.
        G = np.zeros((LANE, LANE), np.float32)
        H = np.zeros((LANE, LANE), np.float32)
        for c in range(C):
            for t in range(T):
                G[c * T + t, t] = 1.0 / (E * C)
                H[t, c * T + t] = 1.0
        self.se_G, self.se_H = G, H
        if self.use_se:
            self.se_w1 = stack(lambda bp: _pad2(bp["se"]["fc1"]["kernel"], LANE, LANE))
            self.se_w2 = stack(lambda bp: _pad2(bp["se"]["fc2"]["kernel"], LANE, LANE))
        else:
            self.se_w1 = np.zeros((nb, LANE, LANE), np.float32)
            self.se_w2 = np.zeros((nb, LANE, LANE), np.float32)

        # decoder: LN planes; time-upsample + channel projection folded into
        # one (R, P) lane matmul M_dec[c*T+t, p] = W_time[t, p] * W_chan[c],
        # bias_dec[p] = b_time[p] * sum_c W_chan[c] + b_proj
        self.g_ln = ln_plane(p["LN"]["scale"])
        self.b_ln = ln_plane(p["LN"]["bias"])
        w_time = np.asarray(p["conv_out"]["kernel"], np.float32)      # (T, P)
        b_time = np.asarray(p["conv_out"]["bias"], np.float32)        # (P,)
        w_chan = np.asarray(p["project_channels"]["kernel"], np.float32)[:, 0]  # (C,)
        b_proj = float(np.asarray(p["project_channels"]["bias"])[0])
        M_dec = np.zeros((LANE, self.Pp), np.float32)
        for c in range(C):
            M_dec[c * T : c * T + T, : self.P] = w_time * w_chan[c]
        self.m_dec = M_dec
        bias_dec = np.zeros((1, self.Pp), np.float32)
        bias_dec[0, : self.P] = b_time * float(w_chan.sum()) + b_proj
        self.bias_dec = bias_dec
        self.w_out = _pad2(p["fc_out"]["kernel"], Ep, LANE)
        self.b_out = _row(p["fc_out"]["bias"], LANE)

        self._block_weights = [
            self.ln1_g, self.ln1_b, self.c1_mix, self.c1_bias,
            self.bn1_s, self.bn1_t,
            self.ln2_g, self.ln2_b, self.c2_mix, self.c2_bias,
            self.bn2_s, self.bn2_t,
            self.se_w1, self.se_w2,
        ]
        self._dec_weights = [
            self.se_G, self.se_H, self.g_ln, self.b_ln,
            self.m_dec, self.bias_dec, self.w_out, self.b_out,
        ]

        enc_variables = {"params": {"embed_mlp": p["encoder"]["embed_mlp"],
                                    "channelUpscaling": p["encoder"]["channelUpscaling"]}}
        from ..models.encoding import PoseEncoder

        encoder = PoseEncoder(
            dimPosIn=cfg.dimPosIn, dimPosEmb=cfg.dimPosEmb, conv_nChan=self.C,
            n_harmonic_functions=cfg.encoder_n_harmonic_functions,
            omega0=cfg.encoder_omega0,
        )
        self._encoder = encoder
        self._enc_variables = enc_variables

    @functools.partial(jax.jit, static_argnums=(0, 2, 3))
    def _run(self, x: jnp.ndarray, block_b: int, interpret: bool) -> jnp.ndarray:
        b = x.shape[0]
        bp = _ceil(b, block_b)
        y = self._encoder.apply(self._enc_variables, x)  # (B, T, E, C)
        # -> (B, E, C, T) -> (B, E, C*T): E on sublanes, (c, t) on lanes
        y = jnp.transpose(y, (0, 2, 3, 1)).reshape(b, self.E, self.R)
        yp = jnp.zeros((bp, self.Ep, LANE), jnp.float32)
        yp = yp.at[:b, : self.E, : self.R].set(y)

        kernel = functools.partial(
            _conv_mixer_mc_kernel,
            T=self.T, E=self.E, P=self.P, C=self.C, Ep=self.Ep, Pp=self.Pp,
            num_blocks=self.num_blocks, use_se=self.use_se,
            use_max=self.use_max_pooling,
            activation=self.activation, k1=self.k1, k2=self.k2,
            mode_twice=self.mode_twice,
        )

        def _batch_map(nd):
            return lambda i, j: (i,) + (0,) * (nd - 1)

        def _block_map(nd):
            return lambda i, j: (j,) + (0,) * (nd - 1)

        def _const_map(nd):
            return lambda i, j: (0,) * nd

        in_specs = [
            pl.BlockSpec((block_b, self.Ep, LANE), _batch_map(3),
                         memory_space=pltpu.VMEM)
        ] + [
            pl.BlockSpec((1,) + w.shape[1:], _block_map(w.ndim),
                         memory_space=pltpu.VMEM)
            for w in self._block_weights
        ] + [
            pl.BlockSpec(w.shape, _const_map(w.ndim), memory_space=pltpu.VMEM)
            for w in self._dec_weights
        ]
        out = pl.pallas_call(
            kernel,
            grid=(bp // block_b, self.num_blocks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (block_b, self.Pp, LANE), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((bp, self.Pp, LANE), jnp.float32),
            scratch_shapes=[pltpu.VMEM((block_b, self.Ep, LANE), jnp.float32)],
            interpret=interpret,
        )(yp, *[jnp.asarray(w) for w in
                self._block_weights + self._dec_weights])
        return out[:b, : self.P, : self.D_out]

    def __call__(self, x: jnp.ndarray, block_b: int = 8,
                 interpret: bool = False) -> jnp.ndarray:
        block_b = min(block_b, _ceil(x.shape[0], 8))
        return self._run(x, block_b, interpret)


def _conv_mixer_mc_kernel(
    x_ref,
    ln1_g, ln1_b, c1_mix, c1_bias, bn1_s, bn1_t,
    ln2_g, ln2_b, c2_mix, c2_bias, bn2_s, bn2_t,
    se_w1, se_w2,
    se_G, se_H, g_ln, b_ln, m_dec, bias_dec, w_out, b_out,
    out_ref,
    y_scr,
    *, T, E, P, C, Ep, Pp, num_blocks, use_se, use_max, activation, k1, k2,
    mode_twice,
):
    """One ConvMixer block step (grid dim 1) on one batch tile (grid dim 0).

    Activation layout (bb, Ep, R-in-LANE): E sublanes, (c, t) lanes. The
    residual stream lives in y_scr across block steps; the decoder runs in
    the last step.
    """
    f32 = jnp.float32
    j = pl.program_id(1)
    bb = x_ref.shape[0]
    e_idx = jax.lax.broadcasted_iota(jnp.int32, (1, Ep, 1), 1)
    e_mask = e_idx < E
    r_mask = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2) < C * T
    p_mask = jax.lax.broadcasted_iota(jnp.int32, (1, Pp, 1), 1) < P

    @pl.when(j == 0)
    def _load():
        y_scr[:] = x_ref[:]

    def layer_norm(y, g_plane, b_plane):
        """LN over the E sublane axis; params are (Ep, LANE) planes."""
        s = jnp.sum(jnp.where(e_mask, y, 0.0), axis=1, keepdims=True)
        mu = s / E
        d = jnp.where(e_mask, y - mu, 0.0)
        var = jnp.sum(d * d, axis=1, keepdims=True) / E
        inv = jax.lax.rsqrt(var + 1e-5)
        return d * inv * g_plane[None] + b_plane[None]

    def mm_lanes(y3, w2):
        s, kdim = y3.shape[1], y3.shape[2]
        r = jnp.dot(y3.reshape(bb * s, kdim), w2, preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)
        return r.reshape(bb, s, r.shape[-1])

    def conv_mc(y, mix_ref, bias_row, k):
        """'same' multi-channel conv: kw lane matmuls + sublane E-rolls."""
        kh, kw = k
        pw = (kw - 1) // 2
        acc = jnp.zeros_like(y)
        for de in range(kw):
            off_e = de - pw
            z = y
            if off_e:
                z = pltpu.roll(z, (-off_e) % Ep, 1)
                valid = (e_idx + off_e >= 0) & (e_idx + off_e < E)
                z = jnp.where(valid, z, 0.0)
            acc = acc + mm_lanes(z, mix_ref[0, de])
        return acc + bias_row[0, :, :][None]

    def se_gate(y):
        if use_max:
            # max-pool squeeze over (E, C) per t (conv_mixer_model.py:30-36):
            # masked sublane max, then a cross-channel lane max via C-1
            # strided rolls (lane t collects groups c*T + t), masked to the
            # T gate lanes the fc matmuls read.
            m = jnp.max(jnp.where(e_mask, y, -jnp.inf), axis=1, keepdims=True)
            s = m
            for c in range(1, C):
                s = jnp.maximum(s, pltpu.roll(m, (-c * T) % LANE, 2))
            t_lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2) < T
            s = jnp.where(t_lanes, s, 0.0)            # (bb, 1, T-lanes)
        else:
            s = jnp.sum(jnp.where(e_mask, y, 0.0), axis=1, keepdims=True)
            s = mm_lanes(s, se_G[:])                  # (bb, 1, T-lanes)
        e = jnp.maximum(mm_lanes(s, se_w1[0]), 0.0)
        e = jax.nn.sigmoid(mm_lanes(e, se_w2[0]))
        e = mm_lanes(e, se_H[:])                      # (bb, 1, R) gate
        return y * e

    def masked(z):
        return jnp.where(e_mask & r_mask, z, 0.0)

    y = y_scr[:]
    z = layer_norm(y, ln1_g[0], ln1_b[0])
    z = _act(activation, conv_mc(z, c1_mix, c1_bias, k1))
    # inference BatchNorm (identity rows unless regularization == -1)
    z = masked(z * bn1_s[0][None] + bn1_t[0][None])
    if use_se:
        z = se_gate(z)
    y = y + z

    if mode_twice:
        z = layer_norm(y, ln2_g[0], ln2_b[0])
        z = _act(activation, conv_mc(z, c2_mix, c2_bias, k2))
        z = masked(z * bn2_s[0][None] + bn2_t[0][None])
    else:
        z = y  # LN2/conv2 are identity in 'once' mode
    if use_se:
        z = se_gate(z)  # shared SE applies in 'once' mode too (:287-292)
    y = y + z
    y_scr[:] = y

    @pl.when(j == num_blocks - 1)
    def _decode():
        d = layer_norm(y, g_ln[:], b_ln[:])
        d = jnp.where(e_mask, d, 0.0)
        d = mm_lanes(d, m_dec[:]) + bias_dec[:][None]   # (bb, Ep, Pp)
        d = _act("gelu", d)  # decoder hardcodes GELU (conv_mixer_model.py:462)
        d = jnp.where(e_mask, d, 0.0)
        d = jnp.swapaxes(d, 1, 2)                       # (bb, Pp, Ep)
        out = mm_lanes(d, w_out[:]) + b_out[:][None]
        out_ref[:] = jnp.where(p_mask, out, 0.0)


def _conv_mixer_kernel(
    x_ref,
    ln1_g, ln1_b, c1_taps, c1_bias, bn1_s, bn1_t,
    ln2_g, ln2_b, c2_taps, c2_bias, bn2_s, bn2_t,
    se_w1, se_w2,
    g_ln, b_ln, w_time, b_time, w_out, b_out,
    out_ref,
    *, T, E, P, Tp, Pp, num_blocks, use_se, use_max, activation, k1, k2,
    mode_twice, proj_w, proj_b,
):
    f32 = jnp.float32
    e_mask = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2) < E
    t_mask = jax.lax.broadcasted_iota(jnp.int32, (1, Tp, 1), 1) < T
    t_mask_row = jax.lax.broadcasted_iota(jnp.int32, (1, Tp), 1) < T
    p_mask = jax.lax.broadcasted_iota(jnp.int32, (1, Pp, 1), 1) < P
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (1, Tp, 1), 1)
    e_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2)
    bb = x_ref.shape[0]

    def layer_norm(y, gamma_row, beta_row):
        s = jnp.sum(jnp.where(e_mask, y, 0.0), axis=-1, keepdims=True)
        mu = s / E
        d = jnp.where(e_mask, y - mu, 0.0)
        var = jnp.sum(d * d, axis=-1, keepdims=True) / E
        inv = jax.lax.rsqrt(var + 1e-5)
        return d * inv * gamma_row[:, None, :] + beta_row[:, None, :]

    def conv_same(y, taps_ref, bias_row, k):
        """'same' (kh over T, kw over E) stencil: roll + wrap-mask + fma."""
        kh, kw = k
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        acc = jnp.zeros_like(y)
        for dt in range(kh):
            for de in range(kw):
                wgt = taps_ref[dt * kw + de, 0]
                off_t, off_e = dt - ph, de - pw
                z = y
                if off_t:
                    z = pltpu.roll(z, (-off_t) % Tp, 1)  # roll shift must be >= 0
                if off_e:
                    z = pltpu.roll(z, (-off_e) % LANE, 2)
                # zero contributions that wrapped around the T/E edges
                valid = (
                    (t_idx + off_t >= 0) & (t_idx + off_t < T)
                    & (e_idx + off_e >= 0) & (e_idx + off_e < E)
                )
                acc = acc + jnp.where(valid, z, 0.0) * wgt
        return acc + bias_row[:, None, :]

    def se_gate(i, y):
        if use_max:
            # max-pool squeeze (conv_mixer_model.py:30-36): -inf outside the
            # valid E lanes, zeroed on padded t rows to keep the dot finite.
            s = jnp.max(jnp.where(e_mask, y, -jnp.inf), axis=-1)
            s = jnp.where(t_mask_row, s, 0.0)
        else:
            s = jnp.sum(jnp.where(e_mask, y, 0.0), axis=-1) / E  # (bb, Tp)
        e = jnp.maximum(jnp.dot(s, se_w1[i], preferred_element_type=f32,
                                precision=jax.lax.Precision.HIGHEST), 0.0)
        e = jax.nn.sigmoid(jnp.dot(e, se_w2[i], preferred_element_type=f32,
                                   precision=jax.lax.Precision.HIGHEST))
        e = jnp.where(t_mask_row, e, 0.0)
        return y * e[:, :, None]

    def mm_lastdim(y3, w2, bias_row):
        s, kdim = y3.shape[1], y3.shape[2]
        y2 = y3.reshape(bb * s, kdim)
        r = jnp.dot(y2, w2, preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST) + bias_row
        return r.reshape(bb, s, r.shape[-1])

    y = x_ref[:]
    for i in range(num_blocks):
        z = layer_norm(y, ln1_g[i], ln1_b[i])
        z = _act(activation, conv_same(z, c1_taps[i], c1_bias[i], k1))
        # inference BatchNorm (identity rows unless regularization == -1)
        z = z * bn1_s[i][:, None, :] + bn1_t[i][:, None, :]
        z = jnp.where(e_mask & t_mask, z, 0.0)
        if use_se:
            z = se_gate(i, z)
        y = y + z

        if mode_twice:
            z = layer_norm(y, ln2_g[i], ln2_b[i])
            z = _act(activation, conv_same(z, c2_taps[i], c2_bias[i], k2))
            z = z * bn2_s[i][:, None, :] + bn2_t[i][:, None, :]
            z = jnp.where(e_mask & t_mask, z, 0.0)
        else:
            z = y  # LN2/conv2 are identity in 'once' mode
        if use_se:
            z = se_gate(i, z)  # shared SE applies in 'once' mode too (:287-292)
        y = y + z

    y = layer_norm(y, g_ln[:], b_ln[:])
    yt = jnp.swapaxes(y, 1, 2)  # (bb, LANE, Tp)
    yt = mm_lastdim(yt, w_time[:], b_time[:])  # (bb, LANE, Pp)
    y = jnp.swapaxes(yt, 1, 2)  # (bb, Pp, LANE)
    y = jnp.where(e_mask & p_mask, y, 0.0)
    y = y * proj_w + proj_b  # project_channels with C=1
    y = _act("gelu", y)  # decoder hardcodes GELU (conv_mixer_model.py:462)
    out = mm_lastdim(y, w_out[:], b_out[:])
    out_ref[:] = jnp.where(p_mask, out, 0.0)
