from .encoding import ConvEncoder, PoseEncoder
from .mixer_mlp import MlpMixer, MixerBlock, MlpBlock, SELayer
from .mixer_conv import ConvMixer, ConvMixerBlock, ConvBlock, MultiChanSELayer
from .torch_io import (
    export_conv_mixer,
    export_mlp_mixer,
    save_torch_state_dict,
    convert_conv_mixer,
    convert_mlp_mixer,
    load_torch_state_dict,
)

__all__ = [
    "export_conv_mixer",
    "export_mlp_mixer",
    "save_torch_state_dict",
    "PoseEncoder",
    "ConvEncoder",
    "MlpMixer",
    "MixerBlock",
    "MlpBlock",
    "SELayer",
    "ConvMixer",
    "ConvMixerBlock",
    "ConvBlock",
    "MultiChanSELayer",
    "convert_conv_mixer",
    "convert_mlp_mixer",
    "load_torch_state_dict",
]
