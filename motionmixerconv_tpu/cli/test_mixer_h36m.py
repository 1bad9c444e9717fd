"""Pretrained H3.6M evaluation CLI.

Parity with h36m/test_mixer_h36m.py:17-124: per-action evaluation at the
eval-horizon frames [1, 3, 7, 9, 13, 17, 21, 24], with the final headline
metric at idx_eval=7 (frame 24 ~ 1000 ms), velocity (delta_x) decoding by
default, and the full-skeleton 32-joint MPJPE with equal-joint re-insertion.

Accepts either this framework's ``.ckpt`` checkpoints or the reference's
torch ``.pt`` state_dicts (auto-converted via models/torch_io.py).

Usage: python -m motionmixerconv_tpu.cli.test_mixer_h36m --data_dir ... --model_path ...
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..data import H36MDataset
from ..data.constants import (
    H36M_DIM_USED_XYZ,
    H36M_INDEX_TO_EQUAL_EVAL,
    H36M_INDEX_TO_IGNORE_EVAL,
    define_actions,
)
from ..data.windows import batch_starts, gather_windows
from ..metrics.metrics import delta_2_gt
from ..models import convert_mlp_mixer, load_torch_state_dict
from ..train.loop import _make_delta, _per_sample_mpjpe
from ._runner import build_mlp_mixer

EVAL_FRAMES = [1, 3, 7, 9, 13, 17, 21, 24]  # test_mixer_h36m.py:20
IDX_EVAL = 7


def load_model_variables(model, path: str, num_blocks: int,
                         input_n: int = 10, pose_dim: int = 66):
    """Load a checkpoint: .pt (torch state_dict) or .ckpt (this framework)."""
    if path.endswith(".pt") or path.endswith(".pth"):
        sd = load_torch_state_dict(path)
        return convert_mlp_mixer(sd, num_blocks=num_blocks)
    from ..train.state import load_variables

    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, input_n, pose_dim)),
        training=False
    )
    return load_variables(path, template)


def test_pretrained(model, variables, args):
    dim_used = H36M_DIM_USED_XYZ
    ignore = jnp.asarray(H36M_INDEX_TO_IGNORE_EVAL)
    equal = jnp.asarray(H36M_INDEX_TO_EQUAL_EVAL)
    # the reference hardcodes output_n=25 (all 8 horizons); for shorter
    # checkpoints keep the horizons that exist and headline the last one
    frames_avail = [f for f in EVAL_FRAMES if f < args.output_n]
    if not frames_avail:
        raise ValueError(
            f"output_n={args.output_n} leaves no eval horizon (the shortest "
            f"is frame {EVAL_FRAMES[0] + 1}); this checkpoint predicts too "
            "few frames for the per-horizon evaluation")
    idx_eval = len(frames_avail) - 1
    eval_frames = jnp.asarray(frames_avail)

    @jax.jit
    def step(frames, starts, w):
        batch = gather_windows(frames, starts, args.input_n + args.output_n)
        seq = jnp.take(batch, jnp.asarray(dim_used), axis=2)
        seq_in = seq[:, : args.input_n]
        seq_gt = seq[:, args.input_n :]
        if args.delta_x:
            delta = _make_delta(jnp.concatenate([seq_in, seq_gt], axis=1))
            pred = model.apply(variables, delta[:, : args.input_n], training=False)
            pred = delta_2_gt(pred, seq_in[:, -1, :])
        else:
            pred = model.apply(variables, seq_in / 1000.0, training=False)

        b = pred.shape[0]
        gt3 = seq_gt.reshape(b, args.output_n, -1, 3)
        pr3 = pred.reshape(b, args.output_n, -1, 3)
        # per-horizon-frame MPJPE (test_mixer_h36m.py:83-88)
        per_frame = jnp.mean(
            jnp.linalg.norm(gt3 - pr3, axis=-1), axis=-1
        )  # (B, T)
        horizon = jnp.take(per_frame, eval_frames, axis=1)  # (B, n_eval)

        full_gt = batch[:, args.input_n :]
        all_seq = full_gt.at[:, :, jnp.asarray(dim_used)].set(pred)
        all_seq = all_seq.at[:, :, ignore].set(all_seq[:, :, equal])
        all_gt = full_gt.at[:, :, ignore].set(full_gt[:, :, equal])
        per32 = _per_sample_mpjpe(
            all_seq.reshape(b, args.output_n, 32, 3),
            all_gt.reshape(b, args.output_n, 32, 3),
        )
        return (
            jnp.sum(horizon * w[:, None], axis=0),
            jnp.sum(per32 * w),
            jnp.sum(w),
        )

    actions = define_actions(args.actions_to_consider)
    accum32, n_total = 0.0, 0.0
    t3d_all = []
    t3d = np.zeros(len(frames_avail))
    n_horizon = 0.0
    for action in actions:
        ds = H36MDataset(args.data_dir, args.input_n, args.output_n,
                         args.skip_rate, actions=[action], split=2)
        frames = jnp.asarray(ds.frames)
        a32, an = 0.0, 0.0
        for starts, w in batch_starts(ds, args.batch_size_test, shuffle=False):
            h, m32, ws = step(frames, jnp.asarray(starts), jnp.asarray(w))
            t3d += np.asarray(h)
            n_horizon += float(ws)
            a32 += float(m32)
            an += float(ws)
        accum32 += a32
        n_total += an
        print(f"loss at test subject for action : {action} is: {a32 / an:.3f}")
        t3d_all.append(t3d[idx_eval] / n_horizon)

    print(f"overall average loss in mm is: {accum32 / n_total:.4f}")
    final = float(np.mean(t3d_all))
    print(f"overall final loss in mm is: {final:.4f}")
    return accum32 / n_total, final


# architecture/eval-semantics keys auto-filled from a .ckpt's stored
# training args (save_checkpoint meta); explicit CLI flags still win, and
# keys with no flag here (the conv-model ones) ride along for
# build_conv_mixer's getattr defaults.
ARCH_META_KEYS = (
    "input_n", "output_n", "skip_rate", "pose_dim", "activation",
    "hidden_dim", "num_blocks", "tokens_mlp_dim", "channels_mlp_dim",
    "regularization", "r_se", "delta_x", "model_type", "loss_type",
    "conv_nChan", "conv1_kernel_shape", "mode_conv",
    "encoder_n_harmonic_functions", "encoder_omega0", "fused_encoder",
    "harmonic_impl", "embed_dtype",
)


def parse_args(argv=None, meta=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default="./data")
    parser.add_argument("--model_path", type=str, required=True,
                        help=".ckpt (this framework) or .pt (reference torch)")
    parser.add_argument("--input_n", type=int, default=10)
    parser.add_argument("--output_n", type=int, default=25)
    parser.add_argument("--skip_rate", type=int, default=1)
    parser.add_argument("--actions_to_consider", default="all")
    parser.add_argument("--batch_size_test", type=int, default=256)
    parser.add_argument("--pose_dim", type=int, default=66)
    parser.add_argument("--delta_x", default=True,
                        type=lambda s: s not in ("0", "False", "false"))
    parser.add_argument("--activation", default="gelu", type=str)
    parser.add_argument("--hidden_dim", default=50, type=int)
    parser.add_argument("--num_blocks", default=4, type=int)
    parser.add_argument("--tokens_mlp_dim", default=20, type=int)
    parser.add_argument("--channels_mlp_dim", default=50, type=int)
    parser.add_argument("--regularization", default=0.1, type=float)
    parser.add_argument("--r_se", default=8, type=int)
    if meta:
        parser.set_defaults(**{k: meta[k] for k in ARCH_META_KEYS
                               if k in meta})
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    meta = None
    if args.model_path.endswith(".ckpt"):
        from ..train.state import load_checkpoint_meta

        meta = load_checkpoint_meta(args.model_path)
    if meta:
        # re-parse with the checkpoint's training args as defaults —
        # the reference makes the user re-type the architecture flags
        # (test_mixer_h36m.py:24-50) and silently mis-evaluates on a
        # mismatch; here a bare --model_path evaluates the trained config.
        args = parse_args(argv, meta=meta)
    if getattr(args, "loss_type", "mpjpe") != "mpjpe":
        raise ValueError(
            "this CLI evaluates xyz-space checkpoints; the given checkpoint "
            f"was trained with --loss_type {args.loss_type}")
    if getattr(args, "model_type", "mlp") == "conv":
        from ._runner import build_conv_mixer

        model = build_conv_mixer(args, args.pose_dim, args.pose_dim,
                                 args.input_n, args.output_n)
    else:
        model = build_mlp_mixer(args, args.pose_dim, args.input_n,
                                args.output_n)
    variables = load_model_variables(model, args.model_path, args.num_blocks,
                                     args.input_n, args.pose_dim)
    return test_pretrained(model, variables, args)


def cli(argv=None) -> int:
    main(argv)
    return 0


if __name__ == "__main__":
    main()
