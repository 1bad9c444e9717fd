"""Pose encoding (optional NeRF-style harmonic embedding + linear projection).

Parity: conv_mixer/encoding/positional_encoder.py:4-97. The torch version
shuffles a channel axis around with transposes; here the model-internal layout
is feature-last (B, T, E, C) — TPU/NHWC-friendly — so the channel upscaling is
a Dense over a trailing singleton axis, no transposes.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import dense, torch_bias_init, torch_kernel_init


class _FusedHarmonicDense(nn.Module):
    """Drop-in for the ``embed_mlp`` Dense that computes
    harmonic-embed + projection in ONE Pallas kernel (ops/pallas_harmonic.py)
    — the embedding never touches HBM. Parameter names/shapes/inits are
    identical to the Dense it replaces, so checkpoints are interchangeable
    and fused/unfused models share state bit-for-bit.
    """

    dim_harmonic: int
    features: int
    d_in: int
    n_harmonic: int
    omega0: float
    impl: str = "direct"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.pallas_harmonic import make_fused_harmonic_dense

        kernel = self.param(
            "kernel", torch_kernel_init, (self.dim_harmonic, self.features)
        )
        bias = self.param(
            "bias", torch_bias_init(self.dim_harmonic), (self.features,)
        )
        fn = make_fused_harmonic_dense(
            self.d_in, self.features, self.n_harmonic, self.omega0,
            interpret=jax.default_backend() != "tpu",
            impl=self.impl,
        )
        lead = x.shape[:-1]
        out = fn(x.reshape(-1, self.d_in), kernel, bias)
        return out.reshape(*lead, self.features)


class PoseEncoder(nn.Module):
    """(B, in_nTP, dimPosIn) -> (B, in_nTP, dimPosEmb, conv_nChan).

    If ``n_harmonic_functions > 0`` each input feature x is expanded to
    [sin(f_i x), cos(f_i x)] with f_i = omega0 * 2**i, laid out
    feature-major exactly like the reference's
    ``(x[..., None] * frequencies).view(..., -1)`` (positional_encoder.py:86-89).
    """

    dimPosIn: int
    dimPosEmb: int
    conv_nChan: int = 1
    n_harmonic_functions: int = 64
    omega0: float = 0.1
    dtype: Optional[Any] = None
    # fuse harmonic-embed + projection into one Pallas kernel (f32 only;
    # HBM-traffic eliminator — see ops/pallas_harmonic.py). Same params,
    # same numerics to f32 tolerance, checkpoints interchangeable.
    fused: bool = False
    # treat the input as the ALREADY-COMPUTED harmonic embedding
    # (B, T, 2*n*D) — the corpus-level embedding cache (Trainer
    # precompute_embed) pays the trig once per corpus instead of per step.
    # Bit-identical values (same jnp.sin on the same inputs, just batched
    # over the corpus); params unchanged.
    precomputed: bool = False
    # "direct" (reference numerics: sin/cos of every harmonic argument) or
    # "doubling" (normalized angle-doubling recurrence — one transcendental
    # pair + n-1 cheap vector steps; see _doubling_harmonics). Opt-in:
    # matches direct to the precision either method actually has (both are
    # f32-noise above harmonic ~26 at production scales), but is NOT
    # bit-identical, so goldens/checkpoint-parity paths keep "direct".
    harmonic_impl: str = "direct"
    # storage dtype for the MATERIALIZED harmonic embedding (the training
    # step's dominant HBM tensor — 692 MB at b2048, written in the forward
    # and re-read by the backward's weight-grad contraction). jnp.bfloat16
    # halves that traffic; sin/cos values are O(1) so the cast costs ~3
    # decimal digits on the features only (params and all other compute
    # stay f32). Opt-in — NOT bit-identical to the reference.
    embed_dtype: Optional[Any] = None

    def setup(self):
        if (self.harmonic_impl != "direct" and self.precomputed
                and self.n_harmonic_functions > 0):
            raise ValueError(
                f"harmonic_impl={self.harmonic_impl!r} does not combine "
                "with the corpus-level embedding cache (precompute_embed "
                "computes direct trig once — there is no per-step trig to "
                "eliminate)"
            )
        if self.fused and self.precomputed and self.n_harmonic_functions > 0:
            raise ValueError(
                "fused=True does not combine with the corpus-level embedding "
                "cache: the fused kernel computes the harmonics itself from "
                "the RAW pose input; feeding it a precomputed (2nD) "
                "embedding would fail deep inside the kernel reshape"
            )
        if self.fused and self.n_harmonic_functions > 0 and self.dtype is not None:
            raise ValueError(
                "fused=True is f32-only (the Pallas harmonic kernel "
                "accumulates in f32); drop dtype or drop fused"
            )
        if (self.embed_dtype is not None and self.n_harmonic_functions > 0
                and (self.fused or self.precomputed)):
            # would otherwise be a SILENT no-op: the fused kernel never
            # materializes the embedding, and the corpus cache's dtype is
            # fixed when Trainer.precompute_embed builds it
            raise ValueError(
                "embed_dtype only applies to the per-step materialized "
                "harmonic embedding; it has no effect under fused=True "
                "(nothing is materialized) or precomputed=True (the cache "
                "dtype is set at precompute time) — drop one of the flags"
            )
        if self.n_harmonic_functions <= 0:
            dim_harmonic = self.dimPosIn
        else:
            dim_harmonic = self.n_harmonic_functions * self.dimPosIn * 2
        if self.fused and self.n_harmonic_functions > 0 and self.dtype is None:
            self.embed_mlp = _FusedHarmonicDense(
                dim_harmonic=dim_harmonic, features=self.dimPosEmb,
                d_in=self.dimPosIn, n_harmonic=self.n_harmonic_functions,
                omega0=self.omega0, impl=self.harmonic_impl,
                name="embed_mlp",
            )
            self._use_fused = True
        else:
            self.embed_mlp = dense(self.dimPosEmb, fan_in=dim_harmonic,
                                   name="embed_mlp", dtype=self.dtype)
            self._use_fused = False
        self.channelUpscaling = dense(self.conv_nChan, fan_in=1,
                                      name="channelUpscaling", dtype=self.dtype)

    @staticmethod
    def harmonic_features(x: jnp.ndarray, n_harmonic: int, omega0: float,
                          impl: str = "direct") -> jnp.ndarray:
        """(..., D) -> (..., 2*n*D) sin/cos features, the reference layout
        (positional_encoder.py:86-89). The corpus-level cache applies this
        once over all frames."""
        if impl == "doubling":
            return PoseEncoder._doubling_harmonics(x, n_harmonic, omega0)
        if impl != "direct":
            raise ValueError(f"unknown harmonic impl {impl!r}")
        freqs = omega0 * (2.0 ** jnp.arange(n_harmonic, dtype=x.dtype))
        e = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
        return jnp.concatenate([jnp.sin(e), jnp.cos(e)], axis=-1)

    @staticmethod
    def _doubling_harmonics(x: jnp.ndarray, n_harmonic: int,
                            omega0: float) -> jnp.ndarray:
        """Harmonic features via a normalized angle-doubling recurrence.

        The frequencies are geometric (omega0 * 2**i,
        positional_encoder.py:79-84), so sin/cos of every harmonic follow
        from ONE transcendental pair: with z_i = (c_i, s_i) on the unit
        circle, z_{i+1} = z_i^2 — i.e. s' = 2 s c, c' = (c - s)(c + s).
        Both expressions are homogeneous of degree 2, so dividing by
        r = s^2 + c^2 each step pins the radius to 1 exactly (the
        unnormalized recurrence overflows to NaN past harmonic ~28 in f32).

        This replaces 2*n transcendental evaluations per element with one
        sin/cos pair plus (n-1) ~8-flop vector steps — the VPU-trig
        eliminator for the encoder-bound training step (docs/DESIGN.md §6).
        NOT bit-identical to "direct": below the f32 noise crossover
        (harmonic ~26 at production input scales, where |angle| reaches
        2^24) both methods agree to each other's own f64 error; above it
        both are deterministic uniform-on-circle noise — the reference's
        torch.sin of ~1e17-radian f32 angles carries no information either.
        Measured band: `tools/probe.py encoder`; tests/test_models.py pins the
        agreement band and the unit-circle bound.
        """
        from ..ops.pallas_harmonic import _double  # the shared step; the
        # fused kernel and this XLA twin must stay expression-identical
        # (tests/test_pallas_harmonic.py pins their parity)

        if n_harmonic <= 0:  # match the direct impl's empty feature block
            return x[..., :0]
        a = omega0 * x
        s, c = jnp.sin(a), jnp.cos(a)
        sins, coss = [s], [c]
        for _ in range(n_harmonic - 1):
            s, c = _double(s, c)
            sins.append(s)
            coss.append(c)
        sin = jnp.stack(sins, axis=-1).reshape(*x.shape[:-1], -1)
        cos = jnp.stack(coss, axis=-1).reshape(*x.shape[:-1], -1)
        return jnp.concatenate([sin, cos], axis=-1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.precomputed and self.n_harmonic_functions > 0:
            y = self.embed_mlp(x)  # x IS the embedding
        elif self._use_fused:
            y = self.embed_mlp(x)  # fused harmonic+projection, (B, T, E)
        else:
            if self.n_harmonic_functions <= 0:
                embed = x
            else:
                embed = self.harmonic_features(
                    x, self.n_harmonic_functions, self.omega0,
                    impl=self.harmonic_impl,
                )
                if self.embed_dtype is not None:
                    # the cast becomes the root of the trig fusion, so the
                    # buffer XLA materializes (and the backward re-reads)
                    # is embed_dtype-wide; the dense upcasts per-tile
                    embed = embed.astype(self.embed_dtype)
            y = self.embed_mlp(embed)  # (B, T, E)
        y = self.channelUpscaling(y[..., None])  # (B, T, E, C)
        return y


def ConvEncoder(dimPosIn: int, dimPosEmb: int, conv_nChan: int = 1,
                dtype=None) -> PoseEncoder:
    """Working re-design of the reference's broken ``ConvEncoder``.

    The reference module (conv_mixer/encoding/conv_encoder.py:4-30) is dead
    code AND crashes on construction (no ``super().__init__()``, :5-13). Its
    evident intent: a ``Conv2d(1, dimPosEmb, kernel=(1, dimPosIn))`` pose
    embedding followed by the same Linear(1, conv_nChan) channel upscaling
    as PoseEncoder. A conv whose kernel spans the FULL feature width at
    stride 1 is exactly a Dense over features — so the working equivalent
    is ``PoseEncoder`` with the harmonic embedding disabled, which computes
    precisely ``Dense(dimPosEmb)(x)`` then the channel upscale. This factory
    documents that identity and returns that configuration.
    """
    return PoseEncoder(
        dimPosIn=dimPosIn, dimPosEmb=dimPosEmb, conv_nChan=conv_nChan,
        n_harmonic_functions=0, dtype=dtype,
    )
