"""H3.6M direct-prediction training CLI.

Flag surface reproduces h36m/train_mixer_h36m.py:472-607, including the
two-stage parent-parser pattern whose per-loss-type hyperparameter defaults
differ (mpjpe: hidden 50 / blocks 4 / lr 1e-3; angle: hidden 60 / blocks 3 /
lr 1e-2). The hardcoded USER_NAME path switch is replaced by required
--data_dir/--save_path flags.

Usage: python -m motionmixerconv_tpu.cli.train_mixer_h36m --data_dir ... --save_path ...
"""

from __future__ import annotations

import argparse

from ._runner import build_conv_mixer, build_mlp_mixer, run_h36m


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--data_dir", type=str, default="./data",
                        help="path to the unzipped dataset directories (H36M/AMASS/3DPW)")
    parser.add_argument("--save_path", type=str, default="./runs",
                        help="root path for the logging")
    parser.add_argument("--model_path", type=str, default="./checkpoints",
                        help="directory with the models checkpoints")
    parser.add_argument("--input_n", type=int, default=10)
    parser.add_argument("--output_n", type=int, default=25)
    parser.add_argument("--skip_rate", type=int, default=1, choices=[1, 5])
    parser.add_argument("--num_worker", default=4, type=int,
                        help="unused (data pipeline is device-resident)")
    parser.add_argument("--activation", default="mish", type=str)
    parser.add_argument("--r_se", default=8, type=int)
    parser.add_argument("--n_epochs", default=2, type=int)
    parser.add_argument("--batch_size", default=50, type=int)
    parser.add_argument("--dev", default="tpu", type=str,
                        help="unused (device selection is via JAX platform)")
    parser.add_argument("--use_scheduler", default=True, type=lambda s: s not in ("0", "False", "false"))
    parser.add_argument("--milestones", type=int, nargs="*", default=[15, 25, 35, 40])
    parser.add_argument("--gamma", type=float, default=0.1)
    parser.add_argument("--clip_grad", type=float, default=None)
    parser.add_argument("--actions_to_consider", default="all")
    parser.add_argument("--batch_size_test", type=int, default=256)
    parser.add_argument("--visualize_from", type=str, default="test",
                        choices=["train", "val", "test"])
    parser.add_argument("--loss_type", type=str, default="angle",
                        choices=["mpjpe", "angle"])
    parser.add_argument("--model_type", type=str, default="conv",
                        choices=["conv", "mlp"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--epochs_per_dispatch", type=int, default=1,
                        help="fuse K whole epochs (train+val+test) into one "
                             "XLA dispatch; amortizes per-epoch host-sync "
                             "latency on remote/tunneled runtimes (per-epoch "
                             "metrics are unchanged; checkpoints write once "
                             "per chunk)")
    parser.add_argument("--visualize", action="store_true",
                        help="export prediction-vs-gt GIFs after training")
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint path to resume training from "
                             "(a working version of the reference's dead "
                             "--load_checkpoint flag)")
    parser.add_argument("--fused_encoder", action="store_true",
                        help="fuse the harmonic encoder into one Pallas "
                             "kernel (identical params + numerics; measured "
                             "SLOWER than XLA on v5e — kept as the "
                             "reproduction of DESIGN.md §6's training-"
                             "kernel adjudication, ops/pallas_harmonic.py)")
    parser.add_argument("--harmonic_impl", default="direct",
                        choices=("direct", "doubling"),
                        help="harmonic-encoder trig: 'direct' = reference "
                             "numerics (sin/cos of every harmonic), "
                             "'doubling' = normalized angle-doubling "
                             "recurrence (one transcendental pair; equal "
                             "to 'direct' within each method's own f32 "
                             "precision, not bit-identical). The measured "
                             "large-batch fast path: +4.6% at batch 2048, "
                             "a wash at 512, -11% at the default 50 — so "
                             "'direct' stays the default (DESIGN.md §6 "
                             "attack C, tools/probe.py encoder)")
    parser.add_argument("--embed_dtype", default="f32",
                        choices=("f32", "bf16"),
                        help="storage dtype of the MATERIALIZED harmonic "
                             "embedding (the step's dominant HBM tensor). "
                             "'bf16' halves that traffic at ~3 decimal "
                             "digits on the O(1) sin/cos features; params "
                             "and all other compute stay f32. Measured by "
                             "tools/probe.py encoder --variants embed_bf16")
    return parser


def parse_args(argv=None) -> argparse.Namespace:
    parser = build_parser()
    args, _ = parser.parse_known_args(argv)

    if args.loss_type == "mpjpe":
        stage2 = argparse.ArgumentParser(parents=[parser])
        stage2.add_argument("--hidden_dim", default=50, type=int)
        stage2.add_argument("--num_blocks", default=4, type=int)
        stage2.add_argument("--tokens_mlp_dim", default=20, type=int)
        stage2.add_argument("--channels_mlp_dim", default=50, type=int)
        stage2.add_argument("--regularization", default=0.1, type=float)
        stage2.add_argument("--pose_dim", default=66, type=int)
        stage2.add_argument("--delta_x", type=bool, default=False)
        stage2.add_argument("--lr", default=0.001, type=float)
    else:
        stage2 = argparse.ArgumentParser(parents=[parser])
        stage2.add_argument("--hidden_dim", default=60, type=int)
        stage2.add_argument("--num_blocks", default=3, type=int)
        stage2.add_argument("--tokens_mlp_dim", default=40, type=int)
        stage2.add_argument("--channels_mlp_dim", default=60, type=int)
        stage2.add_argument("--regularization", default=0.0, type=float)
        stage2.add_argument("--pose_dim", default=48, type=int)
        stage2.add_argument("--delta_x", type=bool, default=False)
        stage2.add_argument("--lr", default=1e-2, type=float)
    args = stage2.parse_args(argv)

    if args.loss_type == "angle" and args.delta_x:
        raise ValueError("Delta_x and loss type angle cant be used together.")
    return args


def main(argv=None):
    args = parse_args(argv)
    print(args)
    if args.model_type == "mlp":
        model = build_mlp_mixer(args, args.pose_dim, args.input_n, args.output_n)
    else:
        model = build_conv_mixer(args, args.pose_dim, args.pose_dim,
                                 args.input_n, args.output_n)
    model_name = f"h36_3d_{args.output_n}frames_ckpt"
    history, state, trainer = run_h36m(args, model=model, model_name=model_name)
    print(">>> Training finished", {k: v for k, v in history.items() if k != "per_action"})
    return history


if __name__ == "__main__":
    main()


def cli(argv=None) -> int:
    """Console-script entry: discard main()'s history return (exit 0)."""
    main(argv)
    return 0
