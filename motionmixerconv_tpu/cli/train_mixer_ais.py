"""AIS-lab training CLI (ConvMixer).

The reference trainer (h36m/train_mixer_ais.py) has no __main__ and is only
driven by the Optuna study (conv_optuna_main.py:284); this CLI exposes it
directly with the study's defaults (33 used dims, smoothing_alpha 0.15,
hardcoded action splits at train_mixer_ais.py:84-111).

Usage: python -m motionmixerconv_tpu.cli.train_mixer_ais --data_dir ... --save_path ...
"""

from __future__ import annotations

import argparse

from ._runner import build_conv_mixer, run_ais


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default="./data")
    parser.add_argument("--save_path", type=str, default="./runs")
    parser.add_argument("--input_n", type=int, default=10)
    parser.add_argument("--output_n", type=int, default=10)
    parser.add_argument("--skip_rate", type=int, default=2)
    parser.add_argument("--smoothing_alpha", type=float, default=0.15)
    parser.add_argument("--canonicalize", default=True,
                        type=lambda s: s not in ("0", "False", "false"),
                        help="remove global rotation/translation (local-"
                             "movement variant); disable for global movement")
    parser.add_argument("--activation", default="mish", type=str)
    parser.add_argument("--r_se", default=8, type=int)
    parser.add_argument("--n_epochs", default=20, type=int)
    parser.add_argument("--batch_size", default=50, type=int)
    parser.add_argument("--use_scheduler", default=True,
                        type=lambda s: s not in ("0", "False", "false"))
    parser.add_argument("--milestones", type=int, nargs="*", default=[15, 25, 35, 40])
    parser.add_argument("--gamma", type=float, default=0.1)
    parser.add_argument("--clip_grad", type=float, default=None)
    parser.add_argument("--batch_size_test", type=int, default=256)
    parser.add_argument("--loss_type", type=str, default="mpjpe", choices=["mpjpe"])
    parser.add_argument("--hidden_dim", default=50, type=int)
    parser.add_argument("--num_blocks", default=4, type=int)
    parser.add_argument("--regularization", default=0.1, type=float)
    parser.add_argument("--pose_dim", default=33, type=int)
    parser.add_argument("--lr", default=0.001, type=float)
    parser.add_argument("--conv_nChan", default=1, type=int)
    parser.add_argument("--kernel1_x", default=1, type=int)
    parser.add_argument("--kernel1_y", default=3, type=int)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--epochs_per_dispatch", type=int, default=1,
                        help="fuse K whole epochs (train+val+test) into one "
                             "XLA dispatch; amortizes per-epoch host-sync "
                             "latency on remote/tunneled runtimes (per-epoch "
                             "metrics are unchanged; checkpoints write once "
                             "per chunk)")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    args.conv1_kernel_shape = (args.kernel1_x, args.kernel1_y)
    print(args)
    model = build_conv_mixer(args, args.pose_dim, args.pose_dim,
                             args.input_n, args.output_n)
    model_name = f"ais_3d_{args.output_n}frames_ckpt"
    history, state, trainer = run_ais(args, model=model, model_name=model_name)
    print(">>> Training finished")
    return history


if __name__ == "__main__":
    main()


def cli(argv=None) -> int:
    """Console-script entry: discard main()'s history return (exit 0)."""
    main(argv)
    return 0
