"""Import reference (torch) checkpoints into flax variable trees.

The reference saves ``torch.save(model.state_dict())`` per epoch
(h36m/train_mixer_h36m.py:276). This module converts such a state_dict —
given as a flat ``{name: numpy array}`` dict — into the variable pytree of
the equivalent flax model from this package, so existing trained checkpoints
keep working. torch is only needed to *read* ``.pt`` files
(``load_torch_state_dict``); the conversion itself is numpy-only.

Layout transforms:
- Linear  (out, in)            -> Dense kernel (in, out)
- Conv2d  (out, in, kh, kw)    -> Conv kernel  (kh, kw, in, out)
- Conv2d used as per-frame Linear (k == full feature axis) -> Dense kernel
- Conv1d/Conv2d with k=1 over time-as-channels -> Dense kernel (T, P)
- LayerNorm/BatchNorm weight -> scale; BN running stats -> batch_stats
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

Array = np.ndarray
Flat = Dict[str, Array]


def load_torch_state_dict(path: str) -> Flat:
    """Read a torch .pt state_dict into numpy (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _linear(sd: Flat, prefix: str, use_bias: bool = True) -> dict:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if use_bias:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv2d(sd: Flat, prefix: str) -> dict:
    w = sd[f"{prefix}.weight"]  # (out, in, kh, kw)
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
        "bias": sd[f"{prefix}.bias"],
    }


def _layernorm(sd: Flat, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _se(sd: Flat, prefix: str) -> dict:
    # torch Sequential: excitation.0 / excitation.2 (mlp_mixer.py:22-27) or
    # excitationBlock.0 / excitationBlock.2 (conv_mixer_model.py:40-45).
    for seq_name in ("excitation", "excitationBlock"):
        if f"{prefix}.{seq_name}.0.weight" in sd:
            return {
                "fc1": {"kernel": np.ascontiguousarray(sd[f"{prefix}.{seq_name}.0.weight"].T)},
                "fc2": {"kernel": np.ascontiguousarray(sd[f"{prefix}.{seq_name}.2.weight"].T)},
            }
    raise KeyError(f"no SE excitation weights under {prefix}")


def _reg(sd: Flat, prefix: str, params: dict, batch_stats: dict, key: str) -> None:
    """BatchNorm regularization params, if present (regularization == -1)."""
    if f"{prefix}.weight" in sd:
        params[key] = {
            "BatchNorm_0": {
                "scale": sd[f"{prefix}.weight"],
                "bias": sd[f"{prefix}.bias"],
            }
        }
        batch_stats[key] = {
            "BatchNorm_0": {
                "mean": sd[f"{prefix}.running_mean"],
                "var": sd[f"{prefix}.running_var"],
            }
        }


def _mlp_block(sd: Flat, prefix: str, batch_stats_out: dict, key: str) -> dict:
    p: dict = {
        "fc1": _linear(sd, f"{prefix}.fc1"),
        "fc2": _linear(sd, f"{prefix}.fc2"),
    }
    bs: dict = {}
    _reg(sd, f"{prefix}.reg1", p, bs, "reg1")
    _reg(sd, f"{prefix}.reg2", p, bs, "reg2")
    if bs:
        batch_stats_out[key] = bs
    return p


def convert_mlp_mixer(sd: Flat, num_blocks: int) -> Dict[str, Any]:
    """state_dict of reference h36m/mlp_mixer.py:MlpMixer -> flax variables."""
    params: dict = {}
    batch_stats: dict = {}

    # Conv2d(1, hidden, (1, input_size)) -> Dense(input_size, hidden)
    w = sd["conv.weight"]  # (H, 1, 1, D)
    params["conv"] = {
        "kernel": np.ascontiguousarray(w[:, 0, 0, :].T),
        "bias": sd["conv.bias"],
    }

    for i in range(num_blocks):
        tp = f"Mixer_Block.{i}"
        bp: dict = {}
        bbs: dict = {}
        if f"{tp}.LN1.weight" in sd:
            bp["LN1"] = _layernorm(sd, f"{tp}.LN1")
        if f"{tp}.LN2.weight" in sd:
            bp["LN2"] = _layernorm(sd, f"{tp}.LN2")
        if f"{tp}.mlp_block_token_mixing.fc1.weight" in sd:
            bp["mlp_block_token_mixing"] = _mlp_block(
                sd, f"{tp}.mlp_block_token_mixing", bbs, "mlp_block_token_mixing"
            )
        if f"{tp}.mlp_block_channel_mixing.fc1.weight" in sd:
            bp["mlp_block_channel_mixing"] = _mlp_block(
                sd, f"{tp}.mlp_block_channel_mixing", bbs, "mlp_block_channel_mixing"
            )
        if f"{tp}.se.excitation.0.weight" in sd:
            bp["se"] = _se(sd, f"{tp}.se")
        params[f"Mixer_Block_{i}"] = bp
        if bbs:
            batch_stats[f"Mixer_Block_{i}"] = bbs

    params["LN"] = _layernorm(sd, "LN")
    params["fc_out"] = _linear(sd, "fc_out")
    # Conv1d(seq_len, pred_len, 1) -> Dense(seq_len, pred_len)
    w = sd["conv_out.weight"]  # (P, T, 1)
    params["conv_out"] = {
        "kernel": np.ascontiguousarray(w[:, :, 0].T),
        "bias": sd["conv_out.bias"],
    }

    out: Dict[str, Any] = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def convert_conv_mixer(sd: Flat, num_blocks: int) -> Dict[str, Any]:
    """state_dict of reference h36m/conv_mixer_model.py:ConvMixer -> flax variables."""
    params: dict = {}
    batch_stats: dict = {}

    enc: dict = {"embed_mlp": _linear(sd, "encoder.embed_mlp")}
    enc["channelUpscaling"] = _linear(sd, "encoder.channelUpscaling")
    params["encoder"] = enc

    for i in range(num_blocks):
        tp = f"Mixer_Block.{i}"
        bp: dict = {}
        bbs: dict = {}
        bp["LN1"] = _layernorm(sd, f"{tp}.LN1")
        cb: dict = {"conv": _conv2d(sd, f"{tp}.conv1.conv")}
        cbs: dict = {}
        _reg(sd, f"{tp}.conv1.reg", cb, cbs, "reg")
        bp["conv1"] = cb
        if cbs:
            bbs["conv1"] = cbs
        if f"{tp}.conv2.conv.weight" in sd:
            bp["LN2"] = _layernorm(sd, f"{tp}.LN2")
            cb2: dict = {"conv": _conv2d(sd, f"{tp}.conv2.conv")}
            cbs2: dict = {}
            _reg(sd, f"{tp}.conv2.reg", cb2, cbs2, "reg")
            bp["conv2"] = cb2
            if cbs2:
                bbs["conv2"] = cbs2
        if f"{tp}.se.excitationBlock.0.weight" in sd:
            bp["se"] = _se(sd, f"{tp}.se")
        params[f"Mixer_Block_{i}"] = bp
        if bbs:
            batch_stats[f"Mixer_Block_{i}"] = bbs

    params["LN"] = _layernorm(sd, "LN")
    # Conv2d(in_nTP, out_nTP, 1) -> Dense(in_nTP, out_nTP)
    w = sd["conv_out.weight"]  # (P, T, 1, 1)
    params["conv_out"] = {
        "kernel": np.ascontiguousarray(w[:, :, 0, 0].T),
        "bias": sd["conv_out.bias"],
    }
    # Conv2d(conv_nChan, 1, (1,1)) -> Dense(conv_nChan, 1)
    w = sd["project_channels.weight"]  # (1, C, 1, 1)
    params["project_channels"] = {
        "kernel": np.ascontiguousarray(w[:, :, 0, 0].T),
        "bias": sd["project_channels.bias"],
    }
    params["fc_out"] = _linear(sd, "fc_out")

    out: Dict[str, Any] = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


# --------------------------------------------------------------- export side


def _linear_out(out: Flat, prefix: str, p: dict) -> None:
    out[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _se_out(out: Flat, prefix: str, p: dict, seq_name: str) -> None:
    out[f"{prefix}.{seq_name}.0.weight"] = np.ascontiguousarray(
        np.asarray(p["fc1"]["kernel"]).T
    )
    out[f"{prefix}.{seq_name}.2.weight"] = np.ascontiguousarray(
        np.asarray(p["fc2"]["kernel"]).T
    )


def _layernorm_out(out: Flat, prefix: str, p: dict) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _reg_out(out: Flat, prefix: str, reg_params, reg_stats) -> None:
    """Inverse of ``_reg``: BatchNorm regularization (regularization == -1)
    back to the torch key layout, incl. the ``num_batches_tracked`` counter
    torch's strict ``load_state_dict`` requires (its value is unused unless
    BN momentum is None, so 0 is faithful for a converted checkpoint)."""
    if reg_params is None:
        return
    bn_p = reg_params["BatchNorm_0"]
    bn_s = reg_stats["BatchNorm_0"]
    out[f"{prefix}.weight"] = np.asarray(bn_p["scale"])
    out[f"{prefix}.bias"] = np.asarray(bn_p["bias"])
    out[f"{prefix}.running_mean"] = np.asarray(bn_s["mean"])
    out[f"{prefix}.running_var"] = np.asarray(bn_s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def export_mlp_mixer(variables: Dict[str, Any], num_blocks: int) -> Flat:
    """flax MlpMixer variables -> reference torch state_dict arrays.

    Inverse of ``convert_mlp_mixer``; lets models trained here be loaded by
    the reference's torch code (``torch.save`` the returned dict after
    wrapping values in torch tensors). Covers dropout- and BatchNorm-
    regularized configs (BN running stats from ``batch_stats``).
    """
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    out: Flat = {}
    w = np.asarray(p["conv"]["kernel"])  # (D, H)
    out["conv.weight"] = np.ascontiguousarray(w.T)[:, None, None, :]
    out["conv.bias"] = np.asarray(p["conv"]["bias"])
    for i in range(num_blocks):
        bp = p[f"Mixer_Block_{i}"]
        tp = f"Mixer_Block.{i}"
        if "LN1" in bp:
            _layernorm_out(out, f"{tp}.LN1", bp["LN1"])
        if "LN2" in bp:
            _layernorm_out(out, f"{tp}.LN2", bp["LN2"])
        bbs = bs.get(f"Mixer_Block_{i}", {})
        for mb in ("mlp_block_token_mixing", "mlp_block_channel_mixing"):
            if mb in bp:
                _linear_out(out, f"{tp}.{mb}.fc1", bp[mb]["fc1"])
                _linear_out(out, f"{tp}.{mb}.fc2", bp[mb]["fc2"])
                for reg in ("reg1", "reg2"):
                    _reg_out(out, f"{tp}.{mb}.{reg}", bp[mb].get(reg),
                             bbs.get(mb, {}).get(reg))
        if "se" in bp:
            _se_out(out, f"{tp}.se", bp["se"], "excitation")
    _layernorm_out(out, "LN", p["LN"])
    _linear_out(out, "fc_out", p["fc_out"])
    w = np.asarray(p["conv_out"]["kernel"])  # (T, P)
    out["conv_out.weight"] = np.ascontiguousarray(w.T)[:, :, None]
    out["conv_out.bias"] = np.asarray(p["conv_out"]["bias"])
    return out


def save_torch_state_dict(path: str, sd: Flat) -> None:
    """Write an exported state_dict as a torch .pt file (requires torch)."""
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)


def _conv2d_out(out: Flat, prefix: str, p: dict) -> None:
    w = np.asarray(p["kernel"])  # (kh, kw, in, out)
    out[f"{prefix}.weight"] = np.ascontiguousarray(w.transpose(3, 2, 0, 1))
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def export_conv_mixer(variables: Dict[str, Any], num_blocks: int,
                      n_harmonic_functions: int = 0,
                      omega0: float = 0.1) -> Flat:
    """flax ConvMixer variables -> reference torch state_dict arrays.

    Inverse of ``convert_conv_mixer`` (dropout- and BatchNorm-regularized
    configs, matching export_mlp_mixer). Pass the model's
    ``encoder_n_harmonic_functions``/``encoder_omega0`` so the torch
    ``encoder.frequencies`` buffer (a deterministic constant,
    positional_encoder.py:54-58) is emitted when harmonic encoding is on.
    """
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    out: Flat = {}
    if n_harmonic_functions > 0:
        out["encoder.frequencies"] = (
            omega0 * (2.0 ** np.arange(n_harmonic_functions))
        ).astype(np.float32)
    _linear_out(out, "encoder.embed_mlp", p["encoder"]["embed_mlp"])
    _linear_out(out, "encoder.channelUpscaling", p["encoder"]["channelUpscaling"])
    for i in range(num_blocks):
        bp = p[f"Mixer_Block_{i}"]
        bbs = bs.get(f"Mixer_Block_{i}", {})
        tp = f"Mixer_Block.{i}"
        _layernorm_out(out, f"{tp}.LN1", bp["LN1"])
        _conv2d_out(out, f"{tp}.conv1.conv", bp["conv1"]["conv"])
        _reg_out(out, f"{tp}.conv1.reg", bp["conv1"].get("reg"),
                 bbs.get("conv1", {}).get("reg"))
        if "conv2" in bp:
            _layernorm_out(out, f"{tp}.LN2", bp["LN2"])
            _conv2d_out(out, f"{tp}.conv2.conv", bp["conv2"]["conv"])
            _reg_out(out, f"{tp}.conv2.reg", bp["conv2"].get("reg"),
                     bbs.get("conv2", {}).get("reg"))
        if "se" in bp:
            _se_out(out, f"{tp}.se", bp["se"], "excitationBlock")
            # the reference aliases se2 to se (conv_mixer_model.py:257); its
            # state_dict therefore repeats the same tensors under se2
            if "conv2" in bp:
                _se_out(out, f"{tp}.se2", bp["se"], "excitationBlock")
    _layernorm_out(out, "LN", p["LN"])
    w = np.asarray(p["conv_out"]["kernel"])  # (T, P)
    out["conv_out.weight"] = np.ascontiguousarray(w.T)[:, :, None, None]
    out["conv_out.bias"] = np.asarray(p["conv_out"]["bias"])
    w = np.asarray(p["project_channels"]["kernel"])  # (C, 1)
    out["project_channels.weight"] = np.ascontiguousarray(w.T)[:, :, None, None]
    out["project_channels.bias"] = np.asarray(p["project_channels"]["bias"])
    _linear_out(out, "fc_out", p["fc_out"])
    return out
