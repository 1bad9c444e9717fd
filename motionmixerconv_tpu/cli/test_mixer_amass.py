"""Pretrained AMASS evaluation CLI.

Parity with amass/test_mixer_amass.py:20-60 (same eval body as
train_mixer_amass.test_mpjpe): 18 predicted joints scattered into the
22-joint gt skeleton, MPJPE x1000. The reference divides by a
never-incremented ``n_batches`` and returns inf (test_mixer_amass.py:25,60);
here the divisor is the sample count (the value the reference prints).

Usage: python -m motionmixerconv_tpu.cli.test_mixer_amass --data_dir ... --model_path ...
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ..data import AMASSDataset
from ..models import convert_mlp_mixer, load_torch_state_dict
from ..train import Trainer, make_optimizer
from ._runner import AMASS_DIM_USED, build_mlp_mixer, make_amass_test_fn


# auto-filled from a .ckpt's stored training args; explicit flags win
# (matches cli/test_mixer_h36m.py — the reference makes the user re-type
# the architecture and silently mis-evaluates on a mismatch).
ARCH_META_KEYS = (
    "input_n", "output_n", "skip_rate", "activation", "r_se", "hidden_dim",
    "num_blocks", "tokens_mlp_dim", "channels_mlp_dim", "regularization",
    "pose_dim",
)


def parse_args(argv=None, meta=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default="../data_amass/")
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--input_n", type=int, default=10)
    parser.add_argument("--output_n", type=int, default=25)
    parser.add_argument("--skip_rate", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--activation", default="gelu", type=str)
    parser.add_argument("--r_se", default=8, type=int)
    parser.add_argument("--hidden_dim", default=128, type=int)
    parser.add_argument("--num_blocks", default=5, type=int)
    parser.add_argument("--tokens_mlp_dim", default=20, type=int)
    parser.add_argument("--channels_mlp_dim", default=128, type=int)
    parser.add_argument("--regularization", default=0.1, type=float)
    parser.add_argument("--pose_dim", default=54, type=int)
    if meta:
        parser.set_defaults(**{k: meta[k] for k in ARCH_META_KEYS
                               if k in meta})
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.model_path.endswith(".ckpt"):
        from ..train.state import load_checkpoint_meta

        meta = load_checkpoint_meta(args.model_path)
        if meta:
            args = parse_args(argv, meta=meta)
    model = build_mlp_mixer(args, args.pose_dim, args.input_n, args.output_n)

    if args.model_path.endswith((".pt", ".pth")):
        variables = convert_mlp_mixer(
            load_torch_state_dict(args.model_path), num_blocks=args.num_blocks
        )
    else:
        from ..train.state import load_variables

        template = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.input_n, args.pose_dim)), training=False,
        )
        variables = load_variables(args.model_path, template)

    test = AMASSDataset(args.data_dir, args.input_n, args.output_n,
                        args.skip_rate, split=2)
    frames = jnp.asarray(test.frames)

    # reuse the scatter-eval step through a throwaway Trainer shell
    opt = make_optimizer(lr=1e-3, steps_per_epoch=1)
    trainer = Trainer(
        model, opt, loss_type="mpjpe", dim_used=AMASS_DIM_USED,
        input_n=args.input_n, output_n=args.output_n,
        input_scale=1.0, loss_scale=1000.0,
    )
    amass_test = make_amass_test_fn(trainer)

    class _S:  # minimal state shim exposing .variables()
        def variables(self):
            return variables

    loss = amass_test(_S(), test, frames, args.batch_size)
    print(f"overall average loss in mm is: {loss:.4f}")
    return loss


def cli(argv=None) -> int:
    main(argv)
    return 0


if __name__ == "__main__":
    main()
