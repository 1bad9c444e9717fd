"""Fused harmonic-embedding x Dense Pallas kernel with a custom VJP.

Why this kernel exists (measured, round 3 — `tools/probe.py roofline` +
`tools/probe.py decomp --forward-detail`): the flagship H36M ConvMixer's training step is
HBM-BANDWIDTH-bound (500-675 GB/s achieved, 61-82% of the v5e's 819 GB/s),
and the dominant traffic is the PoseEncoder's materialized harmonic
embedding: XLA cannot fuse the sin/cos producer into a dot operand, so the
(B*T, 2*n*D) tensor — 692 MB at batch 2048 (n=64 harmonics, D=66) — is
written to HBM in the forward and re-read in the backward for the weight
gradient. The encoder is ~94% of the model's FLOPs
(2*n*D*E = 8448 -> E = 50 projection; reference
conv_mixer/encoding/positional_encoder.py:54-91).

This kernel computes ``embed_mlp(harmonic_embed(x))`` without EVER
materializing the embedding in HBM: per 256-row tile, for each harmonic i,
the (rows, D) sin/cos features are built in VMEM/registers and immediately
contracted on the MXU against the i-th (D, E) weight slab. The custom VJP
recomputes the trig in the backward (cheap on the VPU) and accumulates the
full weight gradient in a VMEM-resident (2, n, D, E) block across row
tiles — so the backward reads only x and the upstream gradient. dx is
computed exactly (d sin(fx) = f cos(fx)), so the kernel is safe under
closed-loop rollouts where the encoder input carries gradients.

Weight layout: the flax kernel is (2*n*D, E) with feature index d*n + i
(sin block then cos block, positional_encoder.py:86-89 ``view`` order);
the kernel consumes an i-major (2, n, D, E) reordering done in-graph (a
one-off 1.7 MB transpose XLA folds into the step).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _double(s, c):
    """One normalized angle-doubling step: (sin a, cos a) -> (sin 2a, cos 2a).

    Both doubling expressions are homogeneous of degree 2, so dividing by
    r = s^2 + c^2 pins the radius to 1 exactly — the unnormalized recurrence
    overflows past ~28 doublings in f32 (see
    models/encoding.py PoseEncoder._doubling_harmonics, the XLA twin).
    """
    inv = 1.0 / (s * s + c * c)
    return 2.0 * (s * c) * inv, (c - s) * (c + s) * inv


def _fwd_kernel(n_harmonic: int, tile_rows: int, d_in: int, e_out: int,
                impl: str = "direct"):
    def body(freqs_ref, x_ref, w_ref, b_ref, out_ref):
        x = x_ref[:]  # (TR, D)

        if impl == "doubling":
            # ONE transcendental pair; each harmonic's features come from
            # the carried (s, c) — the VPU-trig eliminator (the direct
            # kernel's 2n sin/cos per element are the measured floor of
            # the training step, docs/DESIGN.md §6).
            def contrib(i, s, c, acc):
                acc = acc + jnp.dot(s, w_ref[0, i],
                                    preferred_element_type=jnp.float32)
                return acc + jnp.dot(c, w_ref[1, i],
                                     preferred_element_type=jnp.float32)

            def step(i, carry):
                s, c, acc = carry
                acc = contrib(i, s, c, acc)
                s, c = _double(s, c)
                return s, c, acc

            # the last harmonic's contribution is peeled so no discarded
            # doubling step runs on the final iteration
            a = x * freqs_ref[0, 0]  # f_0 = omega0
            s, c, acc = jax.lax.fori_loop(
                0, n_harmonic - 1, step,
                (jnp.sin(a), jnp.cos(a),
                 jnp.zeros((tile_rows, e_out), jnp.float32)),
            )
            acc = contrib(n_harmonic - 1, s, c, acc)
        else:
            def step(i, acc):
                f = freqs_ref[0, i]
                xi = x * f
                acc = acc + jnp.dot(jnp.sin(xi), w_ref[0, i],
                                    preferred_element_type=jnp.float32)
                acc = acc + jnp.dot(jnp.cos(xi), w_ref[1, i],
                                    preferred_element_type=jnp.float32)
                return acc

            acc = jax.lax.fori_loop(
                0, n_harmonic, step,
                jnp.zeros((tile_rows, e_out), jnp.float32),
            )
        out_ref[:] = acc + b_ref[:]

    return body


def _bwd_kernel(n_harmonic: int, tile_rows: int, d_in: int, e_out: int,
                impl: str = "direct"):
    def body(freqs_ref, x_ref, g_ref, w_ref, dw_ref, db_ref, dx_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)
            db_ref[:] = jnp.zeros_like(db_ref)

        x = x_ref[:]          # (TR, D)
        g = g_ref[:]          # (TR, E)
        db_ref[:] += jnp.sum(g, axis=0, keepdims=True)

        def accum(i, s, c, dx):
            """Harmonic i's contributions given its (sin, cos) features."""
            # dW[i] = embed_tile^T @ g   — contract the row axis
            dw_ref[0, i] += jax.lax.dot_general(
                s, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw_ref[1, i] += jax.lax.dot_general(
                c, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dx += f * (cos * (g @ Ws^T) - sin * (g @ Wc^T))
            gs = jax.lax.dot_general(
                g, w_ref[0, i], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            gc = jax.lax.dot_general(
                g, w_ref[1, i], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dx + freqs_ref[0, i] * (c * gs - s * gc)

        if impl == "doubling":
            def step(i, carry):
                s, c, dx = carry
                dx = accum(i, s, c, dx)
                s, c = _double(s, c)
                return s, c, dx

            # last harmonic peeled: no discarded doubling on the final pass
            a = x * freqs_ref[0, 0]
            s, c, dx = jax.lax.fori_loop(
                0, n_harmonic - 1, step,
                (jnp.sin(a), jnp.cos(a),
                 jnp.zeros((tile_rows, d_in), jnp.float32)),
            )
            dx_ref[:] = accum(n_harmonic - 1, s, c, dx)
        else:
            def step(i, dx):
                xi = x * freqs_ref[0, i]
                return accum(i, jnp.sin(xi), jnp.cos(xi), dx)

            dx_ref[:] = jax.lax.fori_loop(
                0, n_harmonic, step,
                jnp.zeros((tile_rows, d_in), jnp.float32),
            )

    return body


def make_fused_harmonic_dense(
    d_in: int,
    e_out: int,
    n_harmonic: int,
    omega0: float,
    tile_rows: int = 256,
    interpret: bool = False,
    impl: str = "direct",
) -> Callable:
    """Build ``fn(x2d, kernel, bias) -> (R, E)`` with a custom VJP.

    Args:
        d_in: input feature count D (66 for the H36M flagship).
        e_out: projection width E (dimPosEmb).
        n_harmonic: harmonic count n (>0).
        omega0: base frequency; f_i = omega0 * 2**i.
        tile_rows: rows per kernel tile (R is zero-padded to a multiple).
        interpret: run in the Pallas interpreter (CPU tests).
        impl: "direct" (sin/cos per harmonic — exact reference numerics) or
            "doubling" (normalized angle-doubling recurrence: ONE sin/cos
            pair per element, each harmonic from the carried (s, c) — the
            trig recompute that made the direct kernel lose to XLA becomes
            ~8 VPU flops per harmonic). The doubling VJP uses the analytic
            gradient d sin(f_i x)/dx = f_i cos(f_i x) evaluated at the
            recurrence's own (s_i, c_i) — the gradient of the ideal
            function both impls approximate, matching the direct kernel's
            formula (not strict autodiff through the recurrence).

    ``kernel`` is the flax Dense layout (2*n*d_in, e_out); ``bias`` (e_out,).
    """
    if n_harmonic <= 0:
        raise ValueError("fused harmonic dense needs n_harmonic > 0")
    if impl not in ("direct", "doubling"):
        raise ValueError(f"unknown harmonic impl {impl!r}")
    freqs = jnp.asarray(
        (omega0 * (2.0 ** np.arange(n_harmonic)))[None, :], jnp.float32
    )
    nd = n_harmonic * d_in

    def _reorder(kernel):
        """(2nD, E) d-major -> (2, n, D, E) i-major."""
        k = kernel.reshape(2, d_in, n_harmonic, e_out)
        return k.transpose(0, 2, 1, 3)

    def _restore(dw):
        """(2, n, D, E) -> (2nD, E)."""
        return dw.transpose(0, 2, 1, 3).reshape(2 * nd, e_out)

    def _pad_rows(a):
        r = a.shape[0]
        rp = -(-r // tile_rows) * tile_rows
        if rp != r:
            a = jnp.pad(a, ((0, rp - r), (0, 0)))
        return a, r

    def _run_fwd(x2d, wsc, bias):
        xp, r = _pad_rows(x2d)
        grid = xp.shape[0] // tile_rows
        out = pl.pallas_call(
            _fwd_kernel(n_harmonic, tile_rows, d_in, e_out, impl),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, n_harmonic), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_rows, d_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n_harmonic, d_in, e_out),
                             lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, e_out), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_rows, e_out), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((xp.shape[0], e_out), jnp.float32),
            interpret=interpret,
        )(freqs, xp, wsc, bias[None, :])
        return out[:r]

    def _run_bwd(x2d, wsc, g):
        xp, r = _pad_rows(x2d)
        gp, _ = _pad_rows(g)
        grid = xp.shape[0] // tile_rows
        dw, db, dxp = pl.pallas_call(
            _bwd_kernel(n_harmonic, tile_rows, d_in, e_out, impl),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, n_harmonic), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_rows, d_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_rows, e_out), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n_harmonic, d_in, e_out),
                             lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((2, n_harmonic, d_in, e_out),
                             lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, e_out), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_rows, d_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((2, n_harmonic, d_in, e_out), jnp.float32),
                jax.ShapeDtypeStruct((1, e_out), jnp.float32),
                jax.ShapeDtypeStruct((xp.shape[0], d_in), jnp.float32),
            ),
            interpret=interpret,
        )(freqs, xp, gp, wsc)
        return dw, db[0], dxp[:r]

    @jax.custom_vjp
    def fn(x2d, kernel, bias):
        return _run_fwd(x2d, _reorder(kernel), bias)

    def fwd(x2d, kernel, bias):
        wsc = _reorder(kernel)
        return _run_fwd(x2d, wsc, bias), (x2d, wsc)

    def bwd(res, g):
        x2d, wsc = res
        dw, db, dx = _run_bwd(x2d, wsc, g.astype(jnp.float32))
        return dx, _restore(dw), db

    fn.defvjp(fwd, bwd)
    return fn
