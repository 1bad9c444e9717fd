"""Benchmark suite: training/serving throughput across the framework's real
configurations, each against a live-measured PyTorch-CPU reference baseline.

Configs (VERDICT r1 item 4):
- h36m_conv_b50 / b512 / b2048 : flagship ConvMixer scan-epoch training
- amass_mlp_b200               : AMASS MlpMixer (CLI defaults) training
- h36m_autoreg_b50             : closed-loop autoregressive training
- h36m_full_epoch              : full epoch wall-clock (train + val +
                                 15-action grouped test)
- serving_fused_mc_b8          : fused multi-channel Pallas kernel latency

Baselines run the reference's own torch modules (model, loss, Adam,
autoregressive_process_batch) on CPU when /root/reference is mounted, and
are cached to tests/golden/bench_baseline.json otherwise. The full-epoch
baseline is derived from live-measured per-phase torch throughputs applied
to the same window counts (a literal torch epoch at this corpus size takes
minutes and would dominate the bench).

MFU is estimated from the compiled step's XLA cost-analysis FLOPs against
the chip's bf16 peak (conservative: the f32 path has a lower true peak).

Prints ONE JSON line: the flagship metric plus a "configs" list, each entry
{"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "tests", "golden", "bench_baseline.json")
REFERENCE = "/root/reference"

INPUT_N, OUTPUT_N, POSE_DIM = 10, 25, 66
N_FRAMES = 120000  # synthetic corpus size (fits HBM easily at 96 dims)

# bf16 peak FLOPs by device kind (MFU denominator; f32 true peak is lower)
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}

CONV_KW = dict(
    num_blocks=4, dimPosIn=POSE_DIM, dimPosEmb=50, dimPosOut=POSE_DIM,
    in_nTP=INPUT_N, out_nTP=OUTPUT_N, conv_nChan=1,
    conv1_kernel_shape=(1, 3), conv1_stride=(1, 1), conv1_padding=(0, 1),
    mode_conv="twice", activation="mish", regularization=0.1,
    use_se=True, r_se=8, use_max_pooling=False,
    encoder_n_harmonic_functions=64, encoder_omega0=0.1,
)
MLP_KW = dict(  # AMASS CLI defaults (train_mixer_amass.py:235-246)
    num_classes=54, num_blocks=5, hidden_dim=128, tokens_mlp_dim=20,
    channels_mlp_dim=128, seq_len=INPUT_N, pred_len=OUTPUT_N,
    activation="gelu", regularization=0.1, input_size=54, r_se=8,
    use_se=True,
)
AR_KW = dict(  # autoregressive CLI defaults (train_autoreg_mixer_h36m.py:486-548)
    num_blocks=4, dimPosIn=POSE_DIM, dimPosEmb=192, dimPosOut=POSE_DIM,
    in_nTP=INPUT_N, out_nTP=5, conv_nChan=8, conv1_kernel_shape=(5, 5),
    conv1_stride=(1, 1), conv1_padding=None, mode_conv="twice",
    activation="mish", regularization=-1.0, use_se=True, r_se=8,
    use_max_pooling=False, encoder_n_harmonic_functions=0,
    encoder_omega0=0.1,
)
MC_KW = dict(  # the ConvMixer study's fixed shape (sweep/conv_study.py:61-65)
    num_blocks=6, dimPosIn=POSE_DIM, dimPosEmb=192, dimPosOut=POSE_DIM,
    in_nTP=INPUT_N, out_nTP=10, conv_nChan=8, conv1_kernel_shape=(5, 9),
    conv1_stride=(1, 1), conv1_padding=None, mode_conv="once",
    activation="gelu", regularization=0.1, use_se=True, r_se=8,
    use_max_pooling=False, encoder_n_harmonic_functions=0, encoder_omega0=0.1,
)

# window counts for the full-epoch config
EPOCH_TRAIN_W, EPOCH_VAL_W, EPOCH_TEST_W = 10000, 2000, 15 * 256


# --------------------------------------------------------------- torch side


def _torch_setup():
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # reference hardcodes .cuda()
    for p in (REFERENCE, os.path.join(REFERENCE, "conv_mixer"),
              os.path.join(REFERENCE, "h36m")):
        if p not in sys.path:
            sys.path.insert(0, p)
    return torch


def _torch_conv(torch):
    from h36m.conv_mixer_model import ConvMixer as RefConvMixer

    torch.manual_seed(0)
    return RefConvMixer(**CONV_KW)


def _time_torch_steps(torch, model, step_fn, steps, warmup=2):
    for _ in range(warmup):
        step_fn()
    t0 = time.perf_counter()
    for _ in range(steps):
        step_fn()
    return time.perf_counter() - t0


def measure_torch_baselines() -> dict:
    torch = _torch_setup()
    from h36m.utils.utils_mixer import mpjpe_error as ref_mpjpe

    rs = np.random.RandomState(0)
    out = {}

    def train_steps(model, batch, in_n, out_n, dim, steps, loss_scale=1.0):
        opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-5)
        xb = torch.from_numpy(rs.randn(batch, in_n, dim).astype(np.float32))
        yb = torch.from_numpy(rs.randn(batch, out_n, dim).astype(np.float32))
        model.train()

        def step():
            opt.zero_grad()
            loss = ref_mpjpe(model(xb), yb) * loss_scale
            loss.backward()
            opt.step()

        dt = _time_torch_steps(torch, model, step, steps)
        return steps * batch / dt

    # flagship ConvMixer at three batch sizes
    for batch, steps in ((50, 30), (512, 6), (2048, 2)):
        out[f"h36m_conv_b{batch}"] = train_steps(
            _torch_conv(torch), batch, INPUT_N, OUTPUT_N, POSE_DIM, steps
        )

    # AMASS MlpMixer (x1000 loss)
    from h36m.mlp_mixer import MlpMixer as RefMlpMixer

    torch.manual_seed(1)
    kw = dict(MLP_KW)
    mlp = RefMlpMixer(**kw)
    out["amass_mlp_b200"] = train_steps(mlp, 200, INPUT_N, OUTPUT_N, 54, 15,
                                        loss_scale=1000.0)

    # autoregressive closed-loop training (reference rollout driver)
    import argparse

    from h36m.conv_mixer_model import ConvMixer as RefConvMixer
    from h36m.train_autoreg_mixer_h36m import autoregressive_process_batch

    torch.manual_seed(2)
    ar_kw = dict(AR_KW)
    ar_kw["conv1_padding"] = None
    ar = RefConvMixer(**ar_kw)
    args = argparse.Namespace(
        input_n_dataset=INPUT_N, output_n_dataset=OUTPUT_N,
        input_n_model=INPUT_N, output_n_model=5, step_window=5,
        loss_type="mpjpe",
    )
    dim_used = np.arange(96)[6:72]  # any 66 dims; synthetic data
    opt = torch.optim.Adam(ar.parameters(), lr=1e-3, weight_decay=1e-5)
    batch_t = torch.from_numpy(
        rs.randn(50, INPUT_N + OUTPUT_N, 96).astype(np.float32)
    )
    ar.train()

    def ar_step():
        opt.zero_grad()
        loss, _ = autoregressive_process_batch(
            batch_t.clone(), ar, args, dim_used, teacher_forcing=False
        )
        loss.backward()
        opt.step()

    dt = _time_torch_steps(torch, ar, ar_step, steps=8)
    out["h36m_autoreg_b50"] = 8 * 50 / dt

    # per-phase throughputs for the derived full-epoch baseline
    conv = _torch_conv(torch)
    conv.eval()
    xe = torch.from_numpy(rs.randn(256, INPUT_N, POSE_DIM).astype(np.float32))

    def eval_step():
        with torch.no_grad():
            conv(xe)

    dt = _time_torch_steps(torch, conv, eval_step, steps=8)
    eval_tps = 8 * 256 / dt
    out["h36m_full_epoch_s"] = (
        EPOCH_TRAIN_W / out["h36m_conv_b50"]
        + (EPOCH_VAL_W + EPOCH_TEST_W) / eval_tps
    )

    # serving forward latency, batch 8, study-shaped multi-channel model
    torch.manual_seed(3)
    mc_kw = dict(MC_KW)
    mc = RefConvMixer(**mc_kw)
    mc.eval()
    xs = torch.from_numpy(rs.randn(8, INPUT_N, POSE_DIM).astype(np.float32))

    def mc_fwd():
        with torch.no_grad():
            mc(xs)

    dt = _time_torch_steps(torch, mc, mc_fwd, steps=20)
    out["serving_fused_mc_b8_ms"] = dt / 20 * 1e3
    return out


def get_baselines() -> dict:
    if os.path.isdir(REFERENCE):
        try:
            vals = measure_torch_baselines()
            os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
            with open(BASELINE_CACHE, "w") as f:
                json.dump(vals, f, indent=2)
            return vals
        except Exception as e:  # fall through to cache
            print(f"# torch baselines failed live: {e}", file=sys.stderr)
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    return {}


# ----------------------------------------------------------------- JAX side


def _flops_per_exec(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca.get("flops", 0.0)) if ca else 0.0
    except Exception:
        return 0.0


def _mfu(flops_per_sec: float, device) -> float | None:
    peak = PEAK_FLOPS.get(getattr(device, "device_kind", ""), None)
    return flops_per_sec / peak if peak else None


def measure_jax() -> tuple[dict, str]:
    import jax
    import jax.numpy as jnp

    from motionmixerconv_tpu.data.constants import H36M_DIM_USED_XYZ
    from motionmixerconv_tpu.models import ConvMixer, MlpMixer
    from motionmixerconv_tpu.train import Trainer, make_optimizer
    from motionmixerconv_tpu.train.autoreg_trainer import AutoregressiveTrainer

    dev = jax.devices()[0]
    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.randn(N_FRAMES, 96) * 300.0).astype(np.float32))
    seq_len = INPUT_N + OUTPUT_N
    n_windows = N_FRAMES - seq_len
    out = {}

    def scan_throughput(trainer, batch, n_batches, dims=H36M_DIM_USED_XYZ,
                        reps=3, epoch_fn=None):
        state = trainer.init_state(jax.random.PRNGKey(0))
        starts = jnp.asarray(
            rs.randint(0, n_windows, size=(n_batches, batch)).astype(np.int32))
        w = jnp.ones((n_batches, batch), jnp.float32)
        fn = epoch_fn or trainer._train_epoch_scan
        state, loss = fn(state, frames, starts, w)  # compile
        jax.block_until_ready(loss)
        # the first post-compile execution pays one-time costs (measured ~10x
        # a steady-state call); exclude it from the timed window
        state, loss = fn(state, frames, starts, w)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(reps):
            state, loss = fn(state, frames, starts, w)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        tput = reps * n_batches * batch / dt
        flops = 0.0
        try:
            lowered = fn.lower(state, frames, starts, w)
            flops = _flops_per_exec(lowered.compile())
        except Exception:
            pass
        return tput, (flops * reps / dt if flops else 0.0)

    def conv_trainer():
        model = ConvMixer(**CONV_KW)
        opt = make_optimizer(lr=1e-3, steps_per_epoch=100)
        return Trainer(model, opt, loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ,
                       input_n=INPUT_N, output_n=OUTPUT_N, input_scale=1e-3)

    # flagship at three batch sizes
    for batch, n_batches in ((50, 200), (512, 60), (2048, 30)):
        tr = conv_trainer()
        tput, fps = scan_throughput(tr, batch, n_batches)
        out[f"h36m_conv_b{batch}"] = {"tput": tput, "mfu": _mfu(fps, dev)}

    # AMASS MlpMixer, batch 200 (loss x1000, unscaled input, 54 dims)
    mlp = MlpMixer(**MLP_KW)
    tr = Trainer(mlp, make_optimizer(lr=1e-3, steps_per_epoch=100),
                 loss_type="mpjpe", dim_used=np.arange(12, 66),
                 input_n=INPUT_N, output_n=OUTPUT_N, input_scale=1.0,
                 loss_scale=1000.0)
    tput, fps = scan_throughput(tr, 200, 100)
    out["amass_mlp_b200"] = {"tput": tput, "mfu": _mfu(fps, dev)}

    # autoregressive closed-loop scan-epoch
    ar_model = ConvMixer(**AR_KW)
    ar = AutoregressiveTrainer(
        ar_model, make_optimizer(lr=1e-4, steps_per_epoch=100, clip_grad=1.0),
        loss_type="mpjpe", dim_used=H36M_DIM_USED_XYZ, input_n=INPUT_N,
        output_n=OUTPUT_N, input_n_model=INPUT_N, output_n_model=5,
        step_window=5,
    )
    tput, fps = scan_throughput(ar, 50, 100, epoch_fn=ar._epoch_scan_cl)
    out["h36m_autoreg_b50"] = {"tput": tput, "mfu": _mfu(fps, dev)}

    # full-epoch wall-clock: scanned train epoch + scanned val + grouped
    # 15-action test — the exact phases cli/_runner.py runs per epoch
    from motionmixerconv_tpu.data.windows import WindowedCorpus

    tr = conv_trainer()
    corpus = WindowedCorpus(
        frames=frames,
        window_starts=rs.randint(0, n_windows, EPOCH_TRAIN_W).astype(np.int64),
        seq_len=seq_len)
    val_starts = rs.randint(0, n_windows, EPOCH_VAL_W).astype(np.int64)
    test_starts = rs.randint(0, n_windows, EPOCH_TEST_W).astype(np.int64)
    test_gids = np.repeat(np.arange(15), 256)

    def epoch(state):
        # the scan-epoch step donates `state`, so each call gets its own
        st, _ = tr.train_epoch(state, corpus, frames, 50, seed=0, scan=True)
        vcorpus = WindowedCorpus(frames=frames, window_starts=val_starts,
                                 seq_len=seq_len)
        tr.validate(st, vcorpus, frames, 256)
        tr.evaluate_grouped(st, frames, test_starts, test_gids, 15, 256,
                            "h36m_xyz")
        return st

    epoch(tr.init_state(jax.random.PRNGKey(0)))  # compile all three phases
    state = tr.init_state(jax.random.PRNGKey(1))
    state = epoch(state)  # first post-compile execution pays one-time costs
    t0 = time.perf_counter()
    epoch(state)
    out["h36m_full_epoch_s"] = {"wall_s": time.perf_counter() - t0}

    # fused multi-channel serving kernel, batch 8 (study shape)
    from motionmixerconv_tpu.ops.pallas_conv_mixer import make_fused_conv_mixer

    mc = ConvMixer(**MC_KW)
    x8 = jnp.asarray(rs.randn(8, INPUT_N, POSE_DIM).astype(np.float32) * 0.5)
    variables = mc.init(jax.random.PRNGKey(0), x8, training=False)
    fused = make_fused_conv_mixer(mc, variables)
    fused(x8).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(50):
        y = fused(x8)
    y.block_until_ready()
    out["serving_fused_mc_b8_ms"] = {"ms": (time.perf_counter() - t0) / 50 * 1e3}

    return out, getattr(dev, "device_kind", str(dev))


def main():
    base = get_baselines()
    ours, device_kind = measure_jax()

    configs = []
    for key in ("h36m_conv_b50", "h36m_conv_b512", "h36m_conv_b2048",
                "amass_mlp_b200", "h36m_autoreg_b50"):
        b = base.get(key)
        o = ours[key]
        configs.append({
            "metric": key, "value": round(o["tput"], 1),
            "unit": "train seq/s",
            "vs_baseline": round(o["tput"] / b, 2) if b else None,
            "mfu": round(o["mfu"], 4) if o.get("mfu") else None,
            "baseline_seq_per_s": round(b, 1) if b else None,
        })
    b = base.get("h36m_full_epoch_s")
    o = ours["h36m_full_epoch_s"]["wall_s"]
    configs.append({
        "metric": "h36m_full_epoch", "value": round(o, 3),
        "unit": f"s/epoch (train {EPOCH_TRAIN_W} + val {EPOCH_VAL_W} + "
                f"15-action test {EPOCH_TEST_W} windows)",
        "vs_baseline": round(b / o, 2) if b else None,
        "baseline_s": round(b, 1) if b else None,
    })
    b = base.get("serving_fused_mc_b8_ms")
    o = ours["serving_fused_mc_b8_ms"]["ms"]
    configs.append({
        "metric": "serving_fused_mc_b8", "value": round(o, 3),
        "unit": "ms/batch8 (study-shaped ConvMixer, fused Pallas kernel)",
        "vs_baseline": round(b / o, 2) if b else None,
        "baseline_ms": round(b, 2) if b else None,
    })

    flagship = configs[0]
    print(json.dumps({
        "metric": "train_sequences_per_sec",
        "value": flagship["value"],
        "unit": "seq/s (H36M ConvMixer defaults, batch 50)",
        "vs_baseline": flagship["vs_baseline"],
        "device": device_kind,
        "configs": configs,
    }))


if __name__ == "__main__":
    main()
