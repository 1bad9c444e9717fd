"""Shared checkpoint-meta resolution for the viz consumers.

galleries.py and live.py both load a trained H36M checkpoint post-hoc; the
architecture must come from the checkpoint's stored training args
(``train.state.save_checkpoint`` meta), not CLI defaults — otherwise any
non-default trained config fails to restore or, worse, silently
mis-renders. This helper keeps the two surfaces consistent (one guard set,
one model dispatch); the eval CLIs (cli/test_mixer_h36m.py,
cli/test_mixer_amass.py) use the same meta through argparse
``set_defaults`` so explicit flags win there.
"""

from __future__ import annotations


def resolve_h36m_eval_args(checkpoint: str, data_dir: str, save_path: str,
                           overrides: dict | None = None):
    """(args, model) for evaluating/rendering an H36M xyz checkpoint.

    args start from the training CLI's defaults, are overlaid with the
    checkpoint's stored training args (meta), then with ``overrides``
    (explicit caller flags). Raises with a clear message for angle-loss
    checkpoints (48-dim models cannot be rendered as xyz skeletons).
    """
    from ..cli._runner import build_conv_mixer, build_mlp_mixer
    from ..cli.train_mixer_h36m import parse_args
    from ..data.constants import H36M_DIM_USED_XYZ
    from ..train import load_checkpoint_meta

    args = parse_args([
        "--data_dir", data_dir, "--save_path", save_path,
        "--loss_type", "mpjpe",
    ])
    meta = load_checkpoint_meta(checkpoint)
    if meta:
        args.__dict__.update({k: v for k, v in meta.items()
                              if k not in ("data_dir", "save_path")})
    if overrides:
        args.__dict__.update(overrides)
    if args.loss_type != "mpjpe":
        raise ValueError(
            "xyz-skeleton rendering needs an mpjpe checkpoint; this one was "
            f"trained with --loss_type {args.loss_type} (48-dim angle model)")

    dim = len(H36M_DIM_USED_XYZ)
    if getattr(args, "model_type", "conv") == "mlp":
        model = build_mlp_mixer(args, dim, args.input_n, args.output_n)
    else:
        model = build_conv_mixer(args, dim, dim, args.input_n, args.output_n)
    return args, model
