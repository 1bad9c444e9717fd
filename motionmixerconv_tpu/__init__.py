"""MotionMixerConv-TPU: a TPU-native (JAX/XLA/Pallas/pjit) motion-forecasting framework.

Re-implements the full capability surface of the MotionMixerConv reference
(MLP-Mixer + ConvMixer human-motion forecasting on H3.6M / AMASS / AIS) as a
layered, functional JAX library:

- ``geometry``  — batched rotation conversions + forward kinematics (vmap/jit safe)
- ``data``      — device-resident corpora + windowed samplers (no DataLoader workers)
- ``models``    — flax.linen mixer models (MlpMixer, ConvMixer, PoseEncoder)
- ``metrics``   — MPJPE / AUC-PCK / euler & joint-angle errors, delta decoding
- ``train``     — jitted train/eval steps, autoregressive lax.scan rollout, checkpoints
- ``parallel``  — jax.sharding mesh utilities (data-parallel over ICI)
- ``sweep``     — hyperparameter search (native grid/random engine, optuna-compatible)
- ``viz``       — matplotlib GIF skeleton rendering
"""

from . import geometry, metrics  # lightweight subpackages
from .serving import Predictor

__version__ = "0.1.0"
