"""Consolidated performance probe — the reproduction harness for every
measured claim in DESIGN.md §6.

One parameterized tool replaces the 18 one-off scripts (tools/perf_probe*.py
+ tools/roofline.py, rounds 2-3 — see git history) that produced §6's
numbers; they all re-implemented the same timing loop. Every subcommand
follows the honest-timing rules (CLAUDE.md / DESIGN §6):

- every timed rep ends in a HOST SYNC (device_get of the result); warm
  twice first (the first post-compile execution costs ~10x steady state on
  the tunneled runtime); medians over >= 3 reps.
- FLOPs / bytes come from XLA cost_analysis of the SINGLE step x the scan
  trip count (cost_analysis counts a lax.scan body once).
- results are gated by the shared dtype-aware FLOP + HBM-bandwidth ceilings
  (motionmixerconv_tpu.profiling.check_physical_ceilings).

Subcommands (→ the perf_probe scripts they subsume):

  roofline       batch scaling + lane-alignment vs FLOP/byte roofs
                 (ex roofline.py, perf_probe.py)
  decomp         per-phase time/byte decomposition of the flagship train
                 step with per-phase achieved GB/s — the instrument for the
                 b2048 bandwidth-gap question (ex perf_probe2/3.py)
  amass          AMASS MlpMixer batch scaling + phase decomposition +
                 shape controls (blocks/width/SE/dtype) — the instrument
                 for the amass_mlp_b200 roof-standing question (new r4)
  gather         window-gather formulations standalone + inside the full
                 train step (row/take/pad128/dslice/flat + prefetch) —
                 the b2048 gather instrument (DESIGN §6 attack A)
  encoder        full train step under each encoder mechanism: direct /
                 doubling / fused / fused+doubling / nharm0 / precomputed
                 (ex perf_probe4/6/13/14.py)
  fused-in-scan  fused whole-model forward inside the batch scan
                 (ex perf_probe7.py)
  ar             autoregressive closed-loop bench config re-measure
                 (ex perf_probe9/10/11.py)
  serving        fused Pallas vs jitted XLA serving latency, chained
                 device-only + per-call-synced (ex perf_probe5.py)
  fused-epochs   --epochs_per_dispatch full-epoch scaling
                 (ex perf_probe12.py)
  njobs          Study.optimize(n_jobs) trial overlap (ex perf_probe15.py)
  jitter         relay-RTT vs device-time variance attribution for the
                 short-config per-rep-synced spread (new r5, VERDICT r4
                 item 1)

Examples (the DESIGN §6 reproduction commands):
  python tools/probe.py roofline
  python tools/probe.py decomp --batches 50 512 2048 --forward-detail --controls
  python tools/probe.py encoder --variants direct doubling fused fused_doubling nharm0
  python tools/probe.py ar
  python tools/probe.py serving
  python tools/probe.py fused-epochs --k 10
  python tools/probe.py njobs

All subcommands accept --n-frames/--reps/--n-batches to shrink onto CPU for
smoke-testing (tests/test_probe_tool.py); defaults reproduce the committed
TPU numbers. Each writes /tmp/probe_<subcommand>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # the bench configs ARE the probed configs — one source
from motionmixerconv_tpu.profiling import (
    PEAK_BYTES,
    check_physical_ceilings,
    peak_flops_for,
)

INPUT_N, OUTPUT_N = bench.INPUT_N, bench.OUTPUT_N
SEQ_LEN = INPUT_N + OUTPUT_N
N_BATCHES_MAP = {50: 200, 512: 60, 2048: 30}  # bench.py's trip counts


def log(msg: str) -> None:
    print(msg, flush=True)


def timed(fn, *args, reps=5, warmup=2) -> float:
    """Median wall time of fn(*args), host-synced EVERY rep."""
    import jax

    def sync(r):
        leaves = jax.tree_util.tree_leaves(r)
        if leaves:
            jax.device_get(leaves[-1])

    for _ in range(warmup):
        sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# one source for the cost_analysis extraction: a future fix to the
# FLOP/byte key handling must land in bench and probe at once, or the two
# sets of numbers silently diverge
step_cost = bench._step_cost


def make_frames(n_frames: int, seed: int = 0):
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(seed)
    frames = jnp.asarray((rs.randn(n_frames, 96) * 300.0).astype(np.float32))
    jax.block_until_ready(frames)
    return frames


def flagship_trainer(emb: int = 50, nharm: int = 64, dtype=None,
                     fused: bool = False, impl: str = "direct",
                     embed_dtype=None):
    """The bench flagship (bench.CONV_KW) with encoder-mechanism knobs."""
    from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
    from motionmixerconv_tpu.models import ConvMixer
    from motionmixerconv_tpu.train import Trainer, make_optimizer

    kw = dict(bench.CONV_KW)
    kw.update(dimPosEmb=emb, encoder_n_harmonic_functions=nharm,
              dtype=dtype, encoder_fused=fused, encoder_harmonic_impl=impl,
              encoder_embed_dtype=embed_dtype)
    model = ConvMixer(**kw)
    return Trainer(
        model, make_optimizer(lr=1e-3, steps_per_epoch=100),
        loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
        input_n=INPUT_N, output_n=OUTPUT_N, input_scale=1e-3,
    )


def batch_plan(batches, n_batches_override):
    for b in batches:
        if n_batches_override:
            yield b, n_batches_override
        else:
            yield b, N_BATCHES_MAP.get(b, max(4, min(200, 61440 // b)))


def starts_for(rs, n_windows, n_batches, batch):
    import jax.numpy as jnp

    starts1 = jnp.asarray(rs.randint(0, n_windows, batch).astype(np.int32))
    w1 = jnp.ones((batch,), jnp.float32)
    starts = jnp.asarray(
        rs.randint(0, n_windows, (n_batches, batch)).astype(np.int32))
    w = jnp.ones((n_batches, batch), jnp.float32)
    return starts1, w1, starts, w


def device_kind():
    import jax

    return getattr(jax.devices()[0], "device_kind", str(jax.devices()[0]))


def write_json(name: str, results: dict) -> None:
    path = f"/tmp/probe_{name}.json"
    with open(path, "w") as f:
        json.dump(results, f, indent=2, default=float)
    log(f"wrote {path}")


def _measure_scan_config(tr, frames, batch, n_batches, rs, reps,
                         name="cfg", epoch_attr="_train_epoch_scan_impl",
                         starts_pack=None):
    """bench.py's scan_config methodology for an arbitrary trainer.

    ``starts_pack`` (starts1, w1, starts, w) reuses a caller's window-index
    stream so control rows time the SAME windows as the measurement they
    attribute (ADVICE r4); by default a fresh stream is drawn from ``rs``.
    """
    import jax

    state = tr.init_state(jax.random.PRNGKey(0))
    n_windows = frames.shape[0] - SEQ_LEN
    starts1, w1, starts, w = (starts_pack if starts_pack is not None
                              else starts_for(rs, n_windows, n_batches,
                                              batch))
    step_fn = jax.jit(tr._train_step_impl)
    epoch_fn = jax.jit(getattr(tr, epoch_attr))
    flops, bts = step_cost(step_fn, state, frames, starts1, w1)
    dt = timed(lambda: epoch_fn(state, frames, starts, w)[1], reps=reps)
    dtype = jax.tree_util.tree_leaves(state.params)[0].dtype
    overcounted = check_physical_ceilings(
        name, device_kind=device_kind(), dtype=dtype,
        flops_per_s=flops * n_batches / dt,
        bytes_per_s=bts * n_batches / dt,
        # probe variants (doubling etc.) have heavily-fused byte models;
        # a bytes breach here means the model overcounts, not bad timing
        strict_bytes=False)
    return {
        **({"bytes_model_overcount": True} if overcounted else {}),
        "batch": batch, "n_batches": n_batches,
        "epoch_ms": dt * 1e3, "step_us": dt / n_batches * 1e6,
        "mflop_per_step": flops / 1e6, "mbytes_per_step": bts / 1e6,
        "tflops": flops * n_batches / dt / 1e12,
        "gbytes_s": bts * n_batches / dt / 1e9,
        "seq_per_s": n_batches * batch / dt,
    }


# ------------------------------------------------------------- roofline


def cmd_roofline(args):
    """Batch scaling + lane alignment vs the chip's FLOP/byte roofs
    (cites: DESIGN §6 'where the training step's time goes' item 1/3)."""
    kind = device_kind()
    peak_f = peak_flops_for(kind, "float32")
    peak_b = PEAK_BYTES.get(kind)
    log(f"device: {kind}  (f32 peak "
        f"{(peak_f or float('nan')) / 1e12:.0f} TF/s, HBM "
        f"{(peak_b or float('nan')) / 1e9:.0f} GB/s)")
    frames = make_frames(args.n_frames)
    rs = np.random.RandomState(1)
    results = {"device": kind}

    log("\n-- batch scaling (flagship, E=50); per-rep-synced medians --")
    for batch, n_batches in batch_plan(args.batches, args.n_batches):
        r = _measure_scan_config(flagship_trainer(), frames, batch,
                                 n_batches, rs, args.reps,
                                 name=f"roofline b{batch}")
        fp = f"{r['tflops'] * 1e12 / peak_f * 100:5.2f}%" if peak_f else "?"
        bp = f"{r['gbytes_s'] * 1e9 / peak_b * 100:5.1f}%" if peak_b else "?"
        log(f"B={batch:>5}: {r['epoch_ms']:7.1f} ms/epoch "
            f"{r['step_us']:6.0f} us/step  {r['mflop_per_step']:8.1f} MF "
            f"{r['mbytes_per_step']:7.1f} MB /step  "
            f"{r['tflops']:5.2f} TF/s ({fp} f32 peak)  "
            f"{r['gbytes_s']:5.1f} GB/s ({bp} HBM)  "
            f"{r['seq_per_s'] / 1e3:7.1f} k seq/s")
        results[f"b{batch}"] = r

    if args.lane_check:
        log("\n-- lane alignment at the largest batch: dimPosEmb 50 (pads "
            "to 128 lanes) vs 128 (native) --")
        batch = max(args.batches)
        n_batches = args.n_batches or N_BATCHES_MAP.get(batch, 30)
        for emb in (50, 128):
            r = _measure_scan_config(flagship_trainer(emb=emb), frames,
                                     batch, n_batches, rs, args.reps,
                                     name=f"lane E={emb}")
            log(f"E={emb:>3}: {r['step_us']:6.0f} us/step  "
                f"{r['mflop_per_step']:8.1f} MF/step  "
                f"{r['tflops']:5.2f} TF/s")
            results[f"lane_e{emb}"] = r
    write_json("roofline", results)


# --------------------------------------------------------------- decomp


def _phase_decomp(tr, frames, batch, n_batches, rs, reps, peak_b,
                  name="decomp"):
    """Telescoping per-phase decomposition of ONE trainer's scan step in
    time AND bytes with per-phase achieved GB/s. Phases telescope
    (gather ⊂ fwd ⊂ grad ⊂ full), so the attribution covers 100% of the
    full step by construction; each phase's exclusive time/bytes are the
    deltas. Shared by `decomp` (flagship ConvMixer) and `amass`
    (MlpMixer) — any Trainer with the standard _prepare/_forward surface
    works.

    Returns ``(row, starts_pack)``: the window-index stream all phases
    (including the full-step row) consumed, so callers can time their
    detail/control rows on the SAME windows (ADVICE r4)."""
    import jax
    import jax.numpy as jnp

    from motionmixerconv_tpu.data.windows import gather_windows
    from motionmixerconv_tpu.train.loop import _per_sample_mpjpe, _wmean

    n_windows = frames.shape[0] - SEQ_LEN
    state = tr.init_state(jax.random.PRNGKey(0))
    variables = state.variables()
    starts1, w1, starts, w = starts_for(rs, n_windows, n_batches, batch)

    def body_gather(c, s, wv):
        b = gather_windows(frames, s, SEQ_LEN)
        mi, gt, _ = tr._prepare(b)
        return c, mi.sum() + gt.sum()

    def body_fwd(v, s, wv):
        b = gather_windows(frames, s, SEQ_LEN)
        mi, gt, _ = tr._prepare(b)
        pred, _ = tr._forward(v, mi, training=False)
        return v, _wmean(_per_sample_mpjpe(pred, gt), wv)

    def body_grad(st, s, wv):
        b = gather_windows(frames, s, SEQ_LEN)
        mi, gt, _ = tr._prepare(b)

        def loss_fn(params):
            pred = tr.model.apply(
                {"params": params}, mi, training=True,
                rngs={"dropout": st.rng},
            ).astype(jnp.float32)
            return _wmean(_per_sample_mpjpe(pred, gt), wv)

        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        gsum = jax.tree_util.tree_reduce(
            lambda a, g: a + g.sum(), grads, 0.0)
        return st, loss + 0.0 * gsum

    def make_pair(body, carry):
        step = jax.jit(lambda c, s, wv: body(c, s, wv)[1])

        @jax.jit
        def epoch(c, st, ww):
            def f(cc, sw):
                return body(cc, *sw)

            _, out = jax.lax.scan(f, c, (st, ww))
            return out.sum()

        return step, epoch, carry

    phases = [
        ("gather", *make_pair(body_gather, 0.0)),
        ("fwd", *make_pair(body_fwd, variables)),
        ("grad", *make_pair(body_grad, state)),
    ]
    row = {"n_batches": n_batches, "phases": {}}
    prev_t, prev_b = 0.0, 0.0
    for pname, step, epoch, carry in phases:
        flops, bts = step_cost(step, carry, starts1, w1)
        dt = timed(epoch, carry, starts, w, reps=reps)
        t_us = dt / n_batches * 1e6
        d_t, d_b = t_us - prev_t, bts - prev_b
        gbs = d_b / (d_t * 1e-6) / 1e9 if d_t > 0 else float("nan")
        row["phases"][pname] = {
            "cum_us": t_us, "excl_us": d_t,
            "cum_mbytes": bts / 1e6, "excl_mbytes": d_b / 1e6,
            "excl_gbytes_s": gbs,
        }
        prev_t, prev_b = t_us, bts

    # full step via the production impls (includes optimizer + decay),
    # timed on the same index stream as the telescoped phases
    full = _measure_scan_config(tr, frames, batch, n_batches, rs,
                                reps, name=f"{name} full b{batch}",
                                starts_pack=(starts1, w1, starts, w))
    d_t = full["step_us"] - prev_t
    d_b = full["mbytes_per_step"] * 1e6 - prev_b
    row["phases"]["optimizer"] = {
        "cum_us": full["step_us"], "excl_us": d_t,
        "cum_mbytes": full["mbytes_per_step"],
        "excl_mbytes": d_b / 1e6,
        "excl_gbytes_s": (d_b / (d_t * 1e-6) / 1e9 if d_t > 0
                          else float("nan")),
    }
    row["full"] = full
    bp = (f"{full['gbytes_s'] * 1e9 / peak_b * 100:.1f}%"
          if peak_b else "?")
    log(f"\nB={batch}: full {full['step_us']:.0f} us/step, "
        f"{full['gbytes_s']:.0f} GB/s achieved ({bp} of roof)")
    for pname, p in row["phases"].items():
        log(f"  {pname:>9}: excl {p['excl_us']:7.1f} us  "
            f"{p['excl_mbytes']:8.1f} MB  -> {p['excl_gbytes_s']:6.1f} "
            f"GB/s   (cum {p['cum_us']:.0f} us)")
    return row, (starts1, w1, starts, w)


def cmd_decomp(args):
    """Cumulative-phase decomposition of the flagship train step, in time
    AND bytes, with per-phase achieved GB/s — attributes the achieved-
    bandwidth fade at large batch (VERDICT r3 item 3). Phases telescope
    (gather ⊂ fwd ⊂ grad ⊂ full), so the attribution covers 100% of the
    full step by construction; each phase's exclusive time/bytes are the
    deltas. --forward-detail splits the forward into trig / embed-matmul /
    encoder / mixer-only. --controls adds nharm0, doubling, and bf16 full
    steps (different traffic mixes triangulate the cause)."""
    import jax.numpy as jnp

    from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ

    kind = device_kind()
    peak_b = PEAK_BYTES.get(kind)
    frames = make_frames(args.n_frames)
    rs = np.random.RandomState(0)
    results = {"device": kind}
    dims = jnp.asarray(H36M_DIM_USED_XYZ)

    for batch, n_batches in batch_plan(args.batches, args.n_batches):
        tr = flagship_trainer()
        row, pack = _phase_decomp(tr, frames, batch, n_batches, rs,
                                  args.reps, peak_b, name="decomp")
        # detail/control rows time the SAME window indices the telescoped
        # phases consumed (ADVICE r4 — a fresh RandomState(0) here timed a
        # different, batch-row-invariant stream)
        starts1, w1, starts, w = pack

        if args.forward_detail:
            det = _forward_detail(tr, frames, dims, starts1, w1, starts, w,
                                  batch, n_batches, args.reps)
            row["forward_detail"] = det
            for k, v in det.items():
                log(f"  fwd.{k:>12}: {v['us']:7.1f} us/step  "
                    f"{v.get('mbytes', 0):8.1f} MB  -> "
                    f"{v.get('gbytes_s', float('nan')):6.1f} GB/s")

        if args.controls:
            ctl = {}
            for cname, kw in (
                ("nharm0", dict(nharm=0)),
                ("doubling", dict(impl="doubling")),
                ("bf16", dict(dtype=jnp.bfloat16)),
            ):
                c = _measure_scan_config(
                    flagship_trainer(**kw), frames, batch, n_batches, rs,
                    args.reps, name=f"decomp {cname} b{batch}",
                    starts_pack=pack)
                ctl[cname] = c
                log(f"  control {cname:>9}: {c['step_us']:7.0f} us/step  "
                    f"{c['gbytes_s']:6.1f} GB/s  {c['tflops']:.2f} TF/s")
            row["controls"] = ctl

        results[f"b{batch}"] = row
    write_json("decomp", results)


def _forward_detail(tr, frames, dims, starts1, w1, starts, w, batch,
                    n_batches, reps):
    """Split the forward: trig-only / embed-matmul / encoder / mixer-only
    (ex perf_probe3.py), each with time + cost-analysis bytes."""
    import jax
    import jax.numpy as jnp

    from motionmixerconv_tpu.data.windows import gather_windows
    from motionmixerconv_tpu.models import PoseEncoder

    nharm = tr.model.encoder_n_harmonic_functions
    emb_dim = tr.model.dimPosEmb
    d_in = tr.model.dimPosIn
    freqs = tr.model.encoder_omega0 * (
        2.0 ** jnp.arange(nharm, dtype=jnp.float32))

    def get_x(s):
        b = gather_windows(frames, s, SEQ_LEN)
        return jnp.take(b, dims, axis=2)[:, :INPUT_N] * 1e-3

    def body_trig(c, s, wv):
        x = get_x(s)
        e = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
        emb = jnp.concatenate([jnp.sin(e), jnp.cos(e)], axis=-1)
        return c, emb.sum()

    rs = np.random.RandomState(3)
    emb_const = jnp.asarray(
        rs.randn(batch * INPUT_N, 2 * nharm * d_in).astype(np.float32) * .3)
    W = jnp.asarray(
        rs.randn(2 * nharm * d_in, emb_dim).astype(np.float32) * 0.01)

    def body_mm(c, s, wv):
        # perturb W with a dynamic (iteration-dependent) epsilon so XLA
        # cannot hoist the loop-invariant matmul out of the scan — the
        # hoisted form measures ~0 (perf_probe3.py had this flaw)
        Wi = W + (s[0] % 2).astype(jnp.float32) * 1e-30
        return c, (emb_const @ Wi).sum()

    enc = PoseEncoder(dimPosIn=d_in, dimPosEmb=emb_dim, conv_nChan=1,
                      n_harmonic_functions=nharm,
                      omega0=tr.model.encoder_omega0)
    ev = enc.init(jax.random.PRNGKey(0), jnp.zeros((2, INPUT_N, d_in)))

    def body_enc(c, s, wv):
        return c, enc.apply(c, get_x(s)).sum()

    out = {}
    for name, body, carry in (("trig_only", body_trig, 0.0),
                              ("embed_mm", body_mm, 0.0),
                              ("encoder", body_enc, ev)):
        step = jax.jit(lambda c, s, wv, b=body: b(c, s, wv)[1])

        @jax.jit
        def epoch(c, st, ww, b=body):
            def f(cc, sw):
                return b(cc, *sw)

            _, o = jax.lax.scan(f, c, (st, ww))
            return o.sum()

        _, bts = step_cost(step, carry, starts1, w1)
        dt = timed(epoch, carry, starts, w, reps=reps)
        us = dt / n_batches * 1e6
        out[name] = {"us": us, "mbytes": bts / 1e6,
                     "gbytes_s": bts / (dt / n_batches) / 1e9}
    return out


# ---------------------------------------------------------------- amass


def amass_trainer(**overrides):
    """The bench AMASS MlpMixer config (bench.MLP_KW = the reference's
    train_mixer_amass.py:235-246 CLI defaults) with shape knobs."""
    from motionmixerconv_tpu.models import MlpMixer
    from motionmixerconv_tpu.train import Trainer, make_optimizer

    kw = dict(bench.MLP_KW)
    kw.update(overrides)
    model = MlpMixer(**kw)
    return Trainer(
        model, make_optimizer(lr=1e-3, steps_per_epoch=100),
        loss_type="mpjpe", dim_used=np.arange(12, 66),
        input_n=INPUT_N, output_n=OUTPUT_N, input_scale=1.0,
        loss_scale=1000.0,
    )


def cmd_amass(args):
    """AMASS MlpMixer (bench amass_mlp_b200) perf attribution: batch
    scaling vs the roofs + the telescoping phase decomposition shared with
    `decomp`, plus shape controls — the instrument for the one DESIGN §6
    row whose roof standing was not yet attributed (r4). Controls
    (--controls): blocks1 (1 mixer block instead of 5 — per-block serial
    cost), hidden512 (4x wider channel dim — FLOP headroom), no_se
    (drop the squeeze-excite reduction chains), bf16 (params+activations
    half-width)."""
    import jax.numpy as jnp

    kind = device_kind()
    peak_b = PEAK_BYTES.get(kind)
    peak_f = peak_flops_for(kind, "float32")
    log(f"device: {kind}  (f32 peak "
        f"{(peak_f or float('nan')) / 1e12:.0f} TF/s, HBM "
        f"{(peak_b or float('nan')) / 1e9:.0f} GB/s)")
    frames = make_frames(args.n_frames)
    rs = np.random.RandomState(0)
    results = {"device": kind}

    for batch, n_batches in batch_plan(args.batches, args.n_batches):
        row, pack = _phase_decomp(amass_trainer(), frames, batch,
                                  n_batches, rs, args.reps, peak_b,
                                  name="amass")
        full = row["full"]
        fp = (f"{full['tflops'] * 1e12 / peak_f * 100:5.2f}%"
              if peak_f else "?")
        log(f"  roofline: {full['tflops']:.2f} TF/s ({fp} f32 peak)  "
            f"{full['seq_per_s'] / 1e3:7.1f} k seq/s")

        if args.controls:
            ctl = {}
            for cname, kw in (
                ("blocks1", dict(num_blocks=1)),
                ("hidden512", dict(hidden_dim=512)),
                ("no_se", dict(use_se=False)),
                ("bf16", dict(dtype=jnp.bfloat16)),
            ):
                c = _measure_scan_config(
                    amass_trainer(**kw), frames, batch, n_batches, rs,
                    args.reps, name=f"amass {cname} b{batch}",
                    starts_pack=pack)
                ctl[cname] = c
                log(f"  control {cname:>9}: {c['step_us']:7.0f} us/step  "
                    f"{c['gbytes_s']:6.1f} GB/s  {c['tflops']:.2f} TF/s  "
                    f"({c['seq_per_s'] / 1e3:.1f} k seq/s)")
            row["controls"] = ctl

        results[f"b{batch}"] = row
    write_json("amass", results)


# ---------------------------------------------------------------- gather


def cmd_gather(args):
    """Window-gather formulations inside the batch scan — instrument for
    the b2048 achieved-bandwidth question (VERDICT r3 item 3). The train
    step's `frames[starts[:,None]+arange(T)]` is a gather of 384-byte
    (96 x f32) rows; `probe.py decomp` measured it row-cost-bound
    (~24 GB/s at b2048). Variants change the gather granularity:

      row      current production form: (B, T) row-index gather
      take     jnp.take(frames, flat_rows, axis=0) (same HLO family)
      pad128   frames zero-padded to (N, 128): 512-B lane-aligned rows,
               sliced back to 96 after the gather (exact values)
      dslice   vmap(dynamic_slice(frames, (s, 0), (T, D))): B contiguous
               (T, D) blocks of ~13 KB instead of B*T rows (exact values)
      flat     element-level gather of the flattened corpus (floor probe)

    Each body sums the gathered window so the gather output is consumed
    exactly once (like the train step's encoder slice)."""
    import jax
    import jax.numpy as jnp

    from motionmixerconv_tpu.data.windows import gather_windows

    frames = make_frames(args.n_frames)
    n_windows = frames.shape[0] - SEQ_LEN
    pad = jnp.pad(frames, ((0, 0), (0, 128 - frames.shape[1])))
    jax.block_until_ready(pad)
    flat = frames.reshape(-1)
    D = frames.shape[1]
    rs = np.random.RandomState(0)
    results = {"device": device_kind()}

    def body_row(s):
        return gather_windows(frames, s, SEQ_LEN).sum()

    def body_take(s):
        idx = (s[:, None] + jnp.arange(SEQ_LEN)[None, :]).reshape(-1)
        return jnp.take(frames, idx, axis=0).sum()

    def body_pad128(s):
        idx = s[:, None] + jnp.arange(SEQ_LEN)[None, :]
        return pad[idx][:, :, :D].sum()

    def body_dslice(s):
        win = jax.vmap(
            lambda st: jax.lax.dynamic_slice(frames, (st, 0), (SEQ_LEN, D))
        )(s)
        return win.sum()

    def body_flat(s):
        idx = (s[:, None, None] * D
               + (jnp.arange(SEQ_LEN) * D)[None, :, None]
               + jnp.arange(D)[None, None, :]).reshape(-1)
        return flat[idx].sum()

    bodies = {"row": body_row, "take": body_take, "pad128": body_pad128,
              "dslice": body_dslice, "flat": body_flat}

    for batch, n_batches in batch_plan(args.batches, args.n_batches):
        starts1, w1, starts, w = starts_for(rs, n_windows, n_batches, batch)
        window_mb = batch * SEQ_LEN * D * 4 / 1e6
        row = {"window_mb_per_step": window_mb}
        for vname in args.variants:
            b = bodies[vname]

            @jax.jit
            def epoch(st, fn=b):
                def f(c, s):
                    return c, fn(s)

                _, out = jax.lax.scan(f, 0.0, st)
                return out.sum()

            # value check: every variant must gather identical windows
            ref = jax.jit(lambda s: body_row(s))(starts1)
            got = jax.jit(lambda s, fn=b: fn(s))(starts1)
            # tolerance covers f32 reduction-order noise in the check sum
            assert abs(float(ref) - float(got)) <= 1e-5 * abs(float(ref)) + 1.0, \
                f"{vname} gathers different values ({got} vs {ref})"
            dt = timed(epoch, starts, reps=args.reps)
            us = dt / n_batches * 1e6
            row[vname] = {
                "us_per_step": us,
                "gbytes_s": window_mb * 1e6 / (us * 1e-6) / 1e9,
            }
            log(f"b{batch} {vname:>7}: {us:8.1f} us/step  "
                f"{row[vname]['gbytes_s']:7.1f} GB/s effective "
                f"({window_mb:.1f} MB windows)")
        if args.full_step:
            for impl in args.full_impls:
                if impl == "prefetch":
                    # prefetch-pipelined epoch: next batch's gather overlaps
                    # this step's compute (_train_epoch_scan_prefetch_impl)
                    r = _measure_scan_config(
                        flagship_trainer(), frames, batch, n_batches, rs,
                        args.reps, name=f"gather full prefetch b{batch}",
                        epoch_attr="_train_epoch_scan_prefetch_impl")
                else:
                    os.environ["MMC_GATHER_IMPL"] = impl
                    try:
                        r = _measure_scan_config(
                            flagship_trainer(), frames, batch, n_batches,
                            rs, args.reps,
                            name=f"gather full {impl} b{batch}")
                    finally:
                        os.environ.pop("MMC_GATHER_IMPL", None)
                row[f"full_step_{impl}"] = r
                log(f"b{batch} full train step [{impl:>8}]: "
                    f"{r['step_us']:8.0f} us/step  "
                    f"({r['seq_per_s']:,.0f} seq/s)")
        results[f"b{batch}"] = row
    write_json("gather", results)


# --------------------------------------------------------------- encoder


def cmd_encoder(args):
    """Full train step under each encoder mechanism (DESIGN §6 'training-
    path kernels' attacks 1/2/4/5 + the nharm=0 floor). 'precomputed'
    builds the corpus-level embedding cache (~4 GB at 120k frames) and a
    cache-gather step (ex perf_probe6.py)."""
    frames = make_frames(args.n_frames)
    rs = np.random.RandomState(0)
    results = {"device": device_kind()}
    import jax.numpy as jnp

    builders = {
        "direct": dict(),
        "nharm0": dict(nharm=0),
        "doubling": dict(impl="doubling"),
        "fused": dict(fused=True),
        "fused_doubling": dict(fused=True, impl="doubling"),
        "embed_bf16": dict(embed_dtype=jnp.bfloat16),
        # cut the VPU trig (doubling) AND halve the embed HBM traffic
        # (bf16 storage) while KEEPING XLA's full-width contraction — the
        # overlapped-resources hypothesis says each alone is a wash because
        # the other is the floor; this removes both at once
        "doubling_bf16": dict(impl="doubling", embed_dtype=jnp.bfloat16),
    }
    for batch, n_batches in batch_plan(args.batches, args.n_batches):
        row = {}
        for vname in args.variants:
            if vname == "precomputed":
                row[vname] = _precomputed_step(frames, batch, n_batches,
                                               args.reps)
            else:
                tr = flagship_trainer(**builders[vname])
                row[vname] = _measure_scan_config(
                    tr, frames, batch, n_batches, rs, args.reps,
                    name=f"encoder {vname} b{batch}")
            log(f"b{batch} {vname:>14}: {row[vname]['step_us']:7.0f} "
                f"us/step  ({row[vname]['seq_per_s']:,.0f} seq/s)")
        if "direct" in row:
            base = row["direct"]["step_us"]
            for vname, r in row.items():
                r["vs_direct"] = base / r["step_us"]
        results[f"b{batch}"] = row
    write_json("encoder", results)


def _precomputed_step(frames, batch, n_batches, reps):
    """Corpus-level embedding cache + cache-gather train step
    (ex perf_probe6.py; DESIGN §6 attack 2)."""
    import jax
    import jax.numpy as jnp
    import optax

    from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
    from motionmixerconv_tpu.data.windows import gather_windows
    from motionmixerconv_tpu.models import ConvMixer, PoseEncoder
    from motionmixerconv_tpu.train import make_optimizer

    nh, omega0 = 64, 0.1
    dims = jnp.asarray(H36M_DIM_USED_XYZ)
    n_frames = frames.shape[0]
    n_windows = n_frames - SEQ_LEN
    rs = np.random.RandomState(0)

    @jax.jit
    def embed_chunk(fr):
        x = jnp.take(fr, dims, axis=1) * 1e-3
        return PoseEncoder.harmonic_features(x, nh, omega0)

    t0 = time.perf_counter()
    chunks = [embed_chunk(frames[i:i + 20000])
              for i in range(0, n_frames, 20000)]
    embed_frames = jnp.concatenate(chunks, axis=0)
    del chunks
    jax.block_until_ready(embed_frames)
    cache_s = time.perf_counter() - t0

    kw = dict(bench.CONV_KW)
    kw["encoder_precomputed"] = True
    model = ConvMixer(**kw)
    opt = make_optimizer(lr=1e-3, steps_per_epoch=100)
    x0 = jnp.zeros((2, INPUT_N, 2 * nh * 66), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, training=False)
    params = variables["params"]
    opt_state = opt.init(params)
    starts1, w1, starts, w = starts_for(rs, n_windows, n_batches, batch)

    def step(params, opt_state, rng, s, wv):
        model_in = gather_windows(embed_frames, s, INPUT_N)
        gt = jnp.take(gather_windows(frames, s + INPUT_N, OUTPUT_N),
                      dims, axis=2)

        def loss_fn(p):
            pred = model.apply({"params": p}, model_in, training=True,
                               rngs={"dropout": rng})
            b = pred.shape[0]
            per = jnp.mean(jnp.linalg.norm(
                (gt - pred).reshape(b, -1, 3), axis=-1), axis=-1)
            return jnp.sum(per * wv) / jnp.maximum(jnp.sum(wv), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def epoch(params, opt_state):
        def body(carry, sw):
            p, o, i = carry
            s, ww = sw
            rng = jax.random.fold_in(jax.random.PRNGKey(7), i)
            p, o, loss = step(p, o, rng, s, ww)
            return (p, o, i + 1), loss

        (p, o, _), losses = jax.lax.scan(
            body, (params, opt_state, 0), (starts, w))
        return losses.sum()

    dt = timed(epoch, params, opt_state, reps=reps)
    return {"step_us": dt / n_batches * 1e6,
            "seq_per_s": n_batches * batch / dt,
            "cache_build_s": cache_s,
            "cache_gb": embed_frames.nbytes / 1e9}


# --------------------------------------------------------- fused-in-scan


def cmd_fused_in_scan(args):
    """Fused whole-model serving forward INSIDE the batch scan vs the plain
    XLA forward (ex perf_probe7.py; DESIGN §6 attack 3: op-dispatch
    overhead does not exist inside lax.scan)."""
    import jax
    import jax.numpy as jnp

    from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
    from motionmixerconv_tpu.data.windows import gather_windows
    from motionmixerconv_tpu.models import ConvMixer
    from motionmixerconv_tpu.ops.pallas_conv_mixer import make_fused_conv_mixer

    frames = make_frames(args.n_frames)
    n_windows = frames.shape[0] - SEQ_LEN
    rs = np.random.RandomState(0)
    dims = jnp.asarray(H36M_DIM_USED_XYZ)
    model = ConvMixer(**bench.CONV_KW)
    x0 = jnp.zeros((8, INPUT_N, 66), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, training=False)
    fused = make_fused_conv_mixer(model, variables)
    results = {"device": device_kind()}

    for batch, n_batches in batch_plan(args.batches, args.n_batches):
        _, _, starts, w = starts_for(rs, n_windows, n_batches, batch)

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

        row = {
            "plain_fwd_us": timed(ep_plain, variables,
                                  reps=args.reps) / n_batches * 1e6,
            "fused_fwd_us": timed(ep_fused, reps=args.reps)
            / n_batches * 1e6,
        }
        row["speedup"] = row["plain_fwd_us"] / row["fused_fwd_us"]
        log(f"b{batch}: plain fwd {row['plain_fwd_us']:.0f} us/step, fused "
            f"fwd {row['fused_fwd_us']:.0f} us/step ({row['speedup']:.2f}x)")
        results[f"b{batch}"] = row
    write_json("fused_in_scan", results)


# -------------------------------------------------------------------- ar


def cmd_ar(args):
    """Re-measure bench.py's h36m_autoreg_b50 stanza (ex perf_probe11.py;
    the unrolled-rollout result, DESIGN §6 table row 4)."""
    import jax

    from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
    from motionmixerconv_tpu.models import ConvMixer
    from motionmixerconv_tpu.train import make_optimizer
    from motionmixerconv_tpu.train.autoreg_trainer import AutoregressiveTrainer

    frames = make_frames(args.n_frames)
    n_windows = frames.shape[0] - SEQ_LEN
    rs = np.random.RandomState(0)
    batch = args.batches[0]
    n_batches = args.n_batches or 100

    ar_model = ConvMixer(**bench.AR_KW)
    ar = AutoregressiveTrainer(
        ar_model, make_optimizer(lr=1e-4, steps_per_epoch=100,
                                 clip_grad=1.0),
        loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ, input_n=INPUT_N,
        output_n=OUTPUT_N, input_n_model=INPUT_N, output_n_model=5,
        step_window=5,
    )
    state = ar.init_state(jax.random.PRNGKey(0))
    starts1, w1, starts, w = starts_for(rs, n_windows, n_batches, batch)
    step_fn = jax.jit(
        lambda s, f, st, ww: ar._ar_train_impl(s, f, st, ww, False))
    epoch_fn = jax.jit(
        lambda s, f, st, ww: ar._ar_epoch_scan_impl(s, f, st, ww, False))
    flops, bts = step_cost(step_fn, state, frames, starts1, w1)
    dt = timed(lambda: epoch_fn(state, frames, starts, w)[1],
               reps=args.reps)
    kind = device_kind()
    dtype = jax.tree_util.tree_leaves(state.params)[0].dtype
    overcounted = check_physical_ceilings(
        "ar", device_kind=kind, dtype=dtype,
        flops_per_s=flops * n_batches / dt,
        bytes_per_s=bts * n_batches / dt,
        # the unrolled rollout's byte model provably overcounts fused VMEM
        # traffic (9.77 GB/step > the roof could move in its honest 7.31 ms;
        # bench.py scan_config docstring) — annotate instead of raising
        strict_bytes=False)
    peak = peak_flops_for(kind, dtype)
    results = {
        **({"bytes_model_overcount": True} if overcounted else {}),
        "device": kind,
        "tput_seq_per_s": n_batches * batch / dt,
        "per_step_us": dt / n_batches * 1e6,
        "mfu": (flops * n_batches / dt / peak) if peak else None,
        "gbytes_s": bts * n_batches / dt / 1e9,
    }
    log(json.dumps(results))
    write_json("ar", results)


# --------------------------------------------------------------- serving


def cmd_serving(args):
    """Fused Pallas vs jitted XLA serving latency, dependency-chained
    (device-only, no relay RTT) (ex perf_probe5.py; DESIGN §6 serving
    table)."""
    import jax
    import jax.numpy as jnp

    from motionmixerconv_tpu.models import ConvMixer, MlpMixer
    from motionmixerconv_tpu.ops.pallas_conv_mixer import make_fused_conv_mixer
    from motionmixerconv_tpu.ops.pallas_mixer import FusedMlpMixer

    rs = np.random.RandomState(0)
    results = {"device": device_kind()}
    n_chain = args.chain

    def chained_ms(fn, x):
        """Dependency-chained device latency: every dispatch's input depends
        on the previous output, so executions serialize on-device and ONE
        final sync amortizes the relay RTT. When out/in shapes differ
        (out_nTP != in_nTP), the dependency is threaded inside one jitted
        link as x + 1e-30*y[0] — N INDEPENDENT un-synced dispatches would
        measure pipelined queueing, not execution (the invalid BENCH_r02
        mode, CLAUDE.md)."""
        y = fn(x)
        jax.block_until_ready(y)
        if y.shape == x.shape:
            link = fn
        else:
            link = jax.jit(
                lambda x0, yp: fn(x0 + 1e-30 * yp.ravel()[0]))
            link = partial(link, x)
            y = link(y)  # compile + warm the link form
            jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(n_chain):
            y = link(y)
        jax.block_until_ready(y)
        return (time.perf_counter() - t0) / n_chain * 1e3

    def pair(name, model, variables, fused, batches):
        plain = jax.jit(lambda v, x: model.apply(v, x, training=False))
        row = {}
        for b in batches:
            rsb = np.random.RandomState(b)
            in_n = getattr(model, "in_nTP", getattr(model, "seq_len", 10))
            d = getattr(model, "dimPosIn", getattr(model, "input_size", 66))
            x = jnp.asarray(rsb.randn(b, in_n, d).astype(np.float32) * 0.5)
            tp = chained_ms(lambda a: plain(variables, a), x)
            tf = chained_ms(fused, x)
            row[f"b{b}"] = {"plain_ms": tp, "fused_ms": tf,
                            "speedup": tp / tf}
            log(f"{name} b{b}: plain {tp:.3f} ms, fused {tf:.3f} ms "
                f"({tp / tf:.2f}x)")
        results[name] = row

    x0 = jnp.zeros((8, 10, 66), jnp.float32)
    mc = ConvMixer(**bench.MC_KW)
    vmc = mc.init(jax.random.PRNGKey(0), x0, training=False)
    pair("conv_mc", mc, vmc, make_fused_conv_mixer(mc, vmc), (8, 32))

    sc = ConvMixer(**bench.CONV_KW)
    vsc = sc.init(jax.random.PRNGKey(1), x0, training=False)
    pair("conv_sc", sc, vsc, make_fused_conv_mixer(sc, vsc), (8, 32))

    mlp = MlpMixer(**bench.MLP_KW)
    x54 = jnp.zeros((8, 10, 54), jnp.float32)
    vm = mlp.init(jax.random.PRNGKey(2), x54, training=False)
    pair("mlp", mlp, vm, FusedMlpMixer(mlp, vm), (8, 32, 128))
    write_json("serving", results)


# ---------------------------------------------------------- fused-epochs


def cmd_fused_epochs(args):
    """Per-epoch wall time: default 3-dispatch path vs K epochs fused into
    one dispatch (ex perf_probe12.py; Trainer.run_epochs_fused)."""
    import jax

    from motionmixerconv_tpu.data.windows import WindowedCorpus

    frames = make_frames(args.n_frames)
    n_windows = frames.shape[0] - SEQ_LEN
    rs = np.random.RandomState(0)
    scale = args.n_frames / 120000.0  # shrink window counts with the corpus
    train_w = max(200, int(bench.EPOCH_TRAIN_W * scale))
    val_w = max(64, int(bench.EPOCH_VAL_W * scale))
    test_w = max(15 * 16, int(bench.EPOCH_TEST_W * scale) // 15 * 15)

    tr = flagship_trainer()
    corpus = WindowedCorpus(
        frames=frames,
        window_starts=rs.randint(0, n_windows, train_w).astype(np.int64),
        seq_len=SEQ_LEN)
    vald = WindowedCorpus(
        frames=frames,
        window_starts=rs.randint(0, n_windows, val_w).astype(np.int64),
        seq_len=SEQ_LEN)
    test_starts = rs.randint(0, n_windows, test_w).astype(np.int64)
    test_gids = np.repeat(np.arange(15), test_w // 15)

    def default_epochs(state, epochs):
        for e in epochs:
            state, _ = tr.train_epoch(state, corpus, frames, 50, seed=e,
                                      scan=True)
            tr.validate(state, vald, frames, 256)
            tr.evaluate_grouped(state, frames, test_starts, test_gids, 15,
                                256, "h36m_xyz")
        return state

    def fused_epochs(state, epochs, k):
        for i in range(0, len(epochs), k):
            state, out = tr.run_epochs_fused(
                state, corpus, frames, 50, epochs[i:i + k], vald, frames,
                frames, test_starts, test_gids, 15, "h36m_xyz", 256)
            _ = out["train"]  # host numpy = synced
        return state

    import jax.random as jrandom

    k, n_ep = args.k, args.epochs
    log("compiling default path...")
    default_epochs(tr.init_state(jrandom.PRNGKey(0)), range(2))
    log("compiling fused path...")
    fused_epochs(tr.init_state(jrandom.PRNGKey(1)), list(range(n_ep)), k)

    results = {"device": device_kind(), "k": k, "epochs": n_ep}
    for name, fn in (
        ("default", lambda s: default_epochs(s, range(n_ep))),
        (f"fused_k{k}", lambda s: fused_epochs(s, list(range(n_ep)), k)),
    ):
        ts = []
        for rep in range(max(3, args.reps)):
            state = tr.init_state(jrandom.PRNGKey(10 + rep))
            t0 = time.perf_counter()
            fn(state)
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        results[name] = {"wall_s": med, "ms_per_epoch": med / n_ep * 1e3}
        log(f"{name}: {med:.3f} s / {n_ep} epochs = "
            f"{med / n_ep * 1e3:.1f} ms/epoch (min {min(ts):.3f} "
            f"max {max(ts):.3f})")
    write_json("fused_epochs", results)


# ----------------------------------------------------------------- njobs


def cmd_njobs(args):
    """Study.optimize(n_jobs) trial overlap on real (tiny) H36M training
    trials (ex perf_probe15.py; DESIGN §7's concurrency claim)."""
    import shutil
    import tempfile

    from motionmixerconv_tpu.data import fixtures
    from motionmixerconv_tpu.sweep import RandomSampler, Study

    data_dir = tempfile.mkdtemp(prefix="probe_njobs_data_")
    fixtures.make_h36m_corpus(data_dir, n_frames=400, seed=1)
    n_trials = args.trials

    def objective_factory(study_dir):
        from motionmixerconv_tpu.sweep.conv_study import parse_args

        def objective(trial):
            from motionmixerconv_tpu.cli._runner import (
                build_conv_mixer,
                run_h36m,
            )

            a = parse_args([
                "--data_dir", data_dir, "--n_epochs", "2",
                "--skip_rate", "5", "--actions_to_consider", "walking",
                "--batch_size", "128",
            ])
            a.loss_type = "mpjpe"
            a.pose_dim = 66
            a.delta_x = False
            a.num_blocks = 2
            a.hidden_dim = trial.suggest_int("hidden_dim", 30, 30)
            a.save_path = os.path.join(study_dir, f"trial{trial.number}")
            model = build_conv_mixer(a, 66, 66, a.input_n, a.output_n)
            history, _, _ = run_h36m(a, model=model, model_name="njobs")
            return history["test"][-1]

        return objective

    warm_dir = tempfile.mkdtemp(prefix="probe_njobs_warm_")
    Study("warm", sampler=RandomSampler(seed=0)).optimize(
        objective_factory(warm_dir), n_trials=1)
    shutil.rmtree(warm_dir, ignore_errors=True)

    results = {"device": device_kind()}
    for n_jobs in args.jobs:
        study_dir = tempfile.mkdtemp(prefix=f"probe_njobs_j{n_jobs}_")
        study = Study(f"j{n_jobs}", sampler=RandomSampler(seed=0))
        t0 = time.time()
        study.optimize(objective_factory(study_dir), n_trials=n_trials,
                       n_jobs=n_jobs)
        dt = time.time() - t0
        assert len(study.trials) == n_trials
        assert all(t.state == "COMPLETE" for t in study.trials)
        results[f"n_jobs={n_jobs}"] = {"wall_s": round(dt, 2),
                                       "s_per_trial": round(dt / n_trials, 2)}
        log(f"n_jobs={n_jobs}: {dt:.1f}s for {n_trials} trials")
        shutil.rmtree(study_dir, ignore_errors=True)
    seq = results.get("n_jobs=1", {}).get("wall_s")
    if seq:
        for k, v in results.items():
            if isinstance(v, dict) and "wall_s" in v:
                v["speedup_vs_seq"] = round(seq / v["wall_s"], 2)
    shutil.rmtree(data_dir, ignore_errors=True)
    log(json.dumps(results))
    write_json("njobs", results)


# ---------------------------------------------------------------- jitter


def _dist(ts) -> dict:
    a = np.asarray(ts, np.float64) * 1e3
    return {"median_ms": float(np.median(a)), "min_ms": float(np.min(a)),
            "max_ms": float(np.max(a)), "p90_ms": float(np.percentile(a, 90)),
            "spread": float((np.max(a) - np.min(a)) / max(np.median(a), 1e-9)),
            "reps": int(len(a))}


def cmd_jitter(args):
    """Attribute the per-rep-synced spread of short configs: relay-RTT
    jitter vs device-time variance (VERDICT r4 item 1 — BENCH_r04's
    h36m_conv_b50 spread was 0.159 while every >=2 ms/step config sat at
    0.01-0.02). Three instruments on the SAME b50 epoch program:

    (a) bare relay RTT: device_get of a tiny READY array — no compute, no
        dispatch; its distribution is the floor every per-rep sync pays.
    (b) per-rep-synced epochs (the bench measurement mode): dispatch one
        scan-epoch, device_get the loss, repeat.
    (c) dependency-chained epochs: K state-threaded epoch dispatches, ONE
        final device_get — per-epoch time with the RTT amortized K-fold,
        isolating device-side variance.

    If (b)'s absolute rep-to-rep wobble matches (a)'s and (c)'s is far
    smaller, the spread is relay jitter on the final sync, not device
    noise — and longer scans (more batches/dispatch) are the honest fix.
    """
    import jax
    import jax.numpy as jnp

    results = {"device": device_kind()}

    tiny = jnp.zeros(())
    jax.block_until_ready(tiny)
    jax.device_get(tiny)  # warm the transfer path
    rtts = []
    for _ in range(args.rtt_reps):
        t0 = time.perf_counter()
        jax.device_get(tiny)
        rtts.append(time.perf_counter() - t0)
    results["relay_rtt"] = _dist(rtts)
    log(f"relay RTT: {results['relay_rtt']}")

    frames = make_frames(args.n_frames)
    n_windows = frames.shape[0] - SEQ_LEN
    rs = np.random.RandomState(0)
    tr = flagship_trainer()
    state = tr.init_state(jax.random.PRNGKey(0))
    epoch_fn = jax.jit(tr._train_epoch_scan_impl)

    for batch in args.batches:
        for n_batches in ([args.n_batches] if args.n_batches
                          else [200, 600]):
            _, _, starts, w = starts_for(rs, n_windows, n_batches, batch)
            jax.device_get(epoch_fn(state, frames, starts, w)[1])
            jax.device_get(epoch_fn(state, frames, starts, w)[1])

            synced = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jax.device_get(epoch_fn(state, frames, starts, w)[1])
                synced.append(time.perf_counter() - t0)

            chained = []
            for _ in range(args.reps):
                st, loss = state, None
                t0 = time.perf_counter()
                for _ in range(args.chain_k):
                    st, loss = epoch_fn(st, frames, starts, w)
                jax.device_get(loss)
                chained.append((time.perf_counter() - t0) / args.chain_k)

            sd, cd = _dist(synced), _dist(chained)
            row = {
                "n_batches": n_batches,
                "per_rep_synced": sd,
                "chained_per_epoch": cd,
                # rep-to-rep wobble in ABSOLUTE ms, comparable across modes
                "synced_wobble_ms": sd["max_ms"] - sd["min_ms"],
                "chained_wobble_ms": cd["max_ms"] - cd["min_ms"],
                "rtt_wobble_ms": (results["relay_rtt"]["max_ms"]
                                  - results["relay_rtt"]["min_ms"]),
            }
            results[f"b{batch}_n{n_batches}"] = row
            log(f"b{batch} n_batches={n_batches}: synced "
                f"{sd['median_ms']:.1f} ms spread {sd['spread']:.3f} | "
                f"chained {cd['median_ms']:.1f} ms spread "
                f"{cd['spread']:.3f} | wobble synced "
                f"{row['synced_wobble_ms']:.1f} vs chained "
                f"{row['chained_wobble_ms']:.1f} vs RTT "
                f"{row['rtt_wobble_ms']:.1f} ms")

    write_json("jitter", results)


# ------------------------------------------------------------------ main


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add(name, fn, **defaults):
        p = sub.add_parser(name, help=(fn.__doc__ or "").splitlines()[0])
        p.add_argument("--n-frames", type=int,
                       default=defaults.get("n_frames", bench.N_FRAMES))
        p.add_argument("--reps", type=int, default=5)
        p.add_argument("--batches", type=int, nargs="*",
                       default=defaults.get("batches", [50, 512, 2048]))
        p.add_argument("--n-batches", type=int, default=None,
                       help="override the per-batch trip count")
        p.set_defaults(fn=fn)
        return p

    p = add("roofline", cmd_roofline)
    p.add_argument("--lane-check", action="store_true", default=True)
    p.add_argument("--no-lane-check", dest="lane_check",
                   action="store_false")

    p = add("decomp", cmd_decomp)
    p.add_argument("--forward-detail", action="store_true")
    p.add_argument("--controls", action="store_true")

    p = add("amass", cmd_amass, batches=[200, 1024, 4096])
    p.add_argument("--controls", action="store_true")

    p = add("gather", cmd_gather)
    p.add_argument("--variants", nargs="*",
                   default=["row", "take", "pad128", "dslice", "flat"],
                   choices=["row", "take", "pad128", "dslice", "flat"])
    p.add_argument("--full-step", action="store_true",
                   help="also time the FULL train step under --full-impls")
    p.add_argument("--full-impls", nargs="*",
                   default=["take", "dslice", "prefetch"],
                   choices=["take", "dslice", "prefetch"])

    p = add("encoder", cmd_encoder)
    p.add_argument("--variants", nargs="*",
                   default=["direct", "nharm0", "doubling", "fused",
                            "fused_doubling"],
                   choices=["direct", "nharm0", "doubling", "fused",
                            "fused_doubling", "precomputed", "embed_bf16",
                            "doubling_bf16"])

    add("fused-in-scan", cmd_fused_in_scan, batches=[50, 512])

    add("ar", cmd_ar, batches=[50])

    p = add("serving", cmd_serving)
    p.add_argument("--chain", type=int, default=100)

    p = add("fused-epochs", cmd_fused_epochs)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--epochs", type=int, default=10)

    p = add("njobs", cmd_njobs)
    p.add_argument("--trials", type=int, default=8)
    p.add_argument("--jobs", type=int, nargs="*", default=[1, 2, 4])

    p = add("jitter", cmd_jitter, batches=[50])
    p.add_argument("--chain-k", type=int, default=5)
    p.add_argument("--rtt-reps", type=int, default=40)
    p.set_defaults(reps=20)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
