"""Serving API: low-latency batched prediction from trained checkpoints.

The reference has no serving path (inference happens inside eval scripts);
this module packages one TPU-first: a ``Predictor`` that loads a checkpoint
(native ``.ckpt`` or reference torch ``.pt``), keeps variables device-resident,
and serves direct or autoregressive predictions. For MlpMixer models it
auto-selects the fused Pallas kernel (ops/pallas_mixer.py) below
``fused_max_batch`` — one kernel dispatch, exact f32 — and the jitted flax
forward above it, where XLA's bulk matmuls win.
"""

from __future__ import annotations

import functools
import warnings
from typing import Optional

import jax
import jax.numpy as jnp

from .models.mixer_mlp import MlpMixer


class Predictor:
    """Device-resident model server.

    Args:
        model: flax module ((B, input_n, D) -> (B, output_n, D)).
        variables: model variables ({'params': ...}).
        use_fused: try the fused Pallas kernel for small batches. Covered:
            every MlpMixer (normal/channel_only/token_only block types) and
            ConvMixer with conv_nChan * in_nTP <= 128 — each incl. BatchNorm
            and avg/max SE configs. Unsupported shapes fall back to the
            jitted flax forward with a visible warning
            (``fused_fallback_reason``).
        fused_max_batch: largest batch routed to the fused kernel.
        mesh: optional ``jax.sharding.Mesh`` — bulk batches shard over its
            'data' axis (parameters replicated), scaling throughput across
            chips over ICI; batches within ``fused_max_batch`` still take
            the single-chip fused kernel (latency path).
    """

    def __init__(self, model, variables: dict, *, use_fused: bool = True,
                 fused_max_batch: int = 128, mesh=None):
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from .parallel.mesh import batch_sharding, replicated_sharding

            self.variables = jax.device_put(variables, replicated_sharding(mesh))
            self._batch_sharding = batch_sharding(mesh)
        else:
            self.variables = jax.device_put(variables)
            self._batch_sharding = None
        self.fused_max_batch = fused_max_batch
        self._plain = jax.jit(
            lambda v, x: self.model.apply(v, x, training=False)
        )
        self._fused = None
        self.fused_fallback_reason: Optional[str] = None
        if use_fused and jax.default_backend() == "tpu":
            try:
                if isinstance(model, MlpMixer):
                    from .ops.pallas_mixer import FusedMlpMixer

                    self._fused = FusedMlpMixer(model, variables)
                else:
                    from .models.mixer_conv import ConvMixer
                    from .ops.pallas_conv_mixer import make_fused_conv_mixer

                    if isinstance(model, ConvMixer):
                        # picks the single-channel stencil kernel or the
                        # multi-channel lane-matmul kernel by conv_nChan
                        self._fused = make_fused_conv_mixer(model, variables)
            except NotImplementedError as e:
                self.fused_fallback_reason = str(e)
                warnings.warn(
                    f"serving: fused kernel unavailable ({e}); "
                    "all batches use the jitted XLA forward",
                    stacklevel=2,
                )

    def replicate_to(self, device) -> "Predictor":
        """A copy of this predictor pinned to ``device``: parameters
        device_put there for the jitted forward, and (when active) the
        fused kernel rebuilt from a host copy of the weights — the fused
        constructors pre-pad weight TILES on the host; the tiles land on
        whichever device executes the call, so each replica's worker must
        run predict under ``jax.default_device(device)`` (which also places
        the request inputs on that chip). The host weight copy is pulled
        ONCE and cached on the source predictor, not once per replica (a
        full-tree device->host sync costs ~30 ms+ on the tunneled runtime).
        """
        import copy as _copy

        clone = _copy.copy(self)
        # replicas are latency paths on a single chip; the mesh bulk path
        # stays with the original predictor
        clone.mesh = None
        clone._batch_sharding = None
        if not hasattr(self, "_host_variables"):
            self._host_variables = jax.device_get(self.variables)
        clone.variables = jax.device_put(self._host_variables, device)
        if self._fused is not None:
            with jax.default_device(device):
                if isinstance(self.model, MlpMixer):
                    from .ops.pallas_mixer import FusedMlpMixer

                    clone._fused = FusedMlpMixer(
                        self.model, self._host_variables)
                else:
                    from .ops.pallas_conv_mixer import make_fused_conv_mixer

                    clone._fused = make_fused_conv_mixer(
                        self.model, self._host_variables)
        return clone

    @classmethod
    def from_checkpoint(cls, model, path: str, num_blocks: Optional[int] = None,
                        sample_shape=(1, 10, 66), **kw) -> "Predictor":
        """Load from a native .ckpt or a reference torch .pt state_dict.

        ``model=None`` rebuilds the exact trained architecture from a native
        checkpoint's stored training args (``save_checkpoint`` meta); torch
        .pt files carry no architecture metadata and need the model passed.
        """
        if model is None:
            from .cli._runner import model_from_checkpoint_meta
            from .train.state import load_checkpoint_meta

            meta = None if path.endswith((".pt", ".pth")) \
                else load_checkpoint_meta(path)
            if not meta:
                raise ValueError(
                    f"{path} carries no training-args meta (reference .pt "
                    "or pre-meta checkpoint); pass the model explicitly")
            model, sample_shape = model_from_checkpoint_meta(meta)
        if path.endswith((".pt", ".pth")):
            from .models import convert_conv_mixer, convert_mlp_mixer, load_torch_state_dict
            from .models.mixer_conv import ConvMixer

            sd = load_torch_state_dict(path)
            conv = convert_conv_mixer if isinstance(model, ConvMixer) else convert_mlp_mixer
            variables = conv(sd, num_blocks=num_blocks or model.num_blocks)
        else:
            from .train.state import load_variables

            template = model.init(
                jax.random.PRNGKey(0), jnp.zeros(sample_shape), training=False
            )
            variables = load_variables(path, template)
        return cls(model, variables, **kw)

    def predict(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, input_n, D) -> (B, output_n, D)."""
        x = jnp.asarray(x)
        b = x.shape[0]
        if self._fused is not None and b <= self.fused_max_batch:
            return self._fused(x)
        if self._batch_sharding is not None:
            # bulk path: pad to a device multiple, shard over 'data'. The
            # pad quantizes compile shapes to multiples of the mesh size.
            n = int(self.mesh.devices.size)
            bp = -(-b // n) * n
            if bp != b:
                x = jnp.concatenate(
                    [x, jnp.zeros((bp - b,) + x.shape[1:], x.dtype)])
            x = jax.device_put(x, self._batch_sharding)
            return self._plain(self.variables, x)[:b]
        return self._plain(self.variables, x)

    @functools.cached_property
    def _rollout_step(self):
        return jax.jit(
            lambda v, x: self.model.apply(v, x, training=False)
        )

    def predict_autoregressive(
        self, x: jnp.ndarray, horizon: int, step_window: Optional[int] = None
    ) -> jnp.ndarray:
        """Closed-loop rollout to an arbitrary horizon.

        Matches the reference rollout feedback (reuse the last
        input_n - step frames, append the prediction;
        train_autoreg_mixer_h36m.py:241-253). ``step_window`` defaults to the
        model's output length.
        """
        from .train.autoregressive import autoregressive_rollout

        in_n = self.model.seq_len if hasattr(self.model, "seq_len") else self.model.in_nTP
        out_n = self.model.pred_len if hasattr(self.model, "pred_len") else self.model.out_nTP
        step = step_window or out_n
        n_steps = -(-horizon // step)  # ceil
        total = in_n + n_steps * step

        x = jnp.asarray(x)
        pad = jnp.zeros((x.shape[0], total - in_n, x.shape[2]), x.dtype)
        seq = jnp.concatenate([x, pad], axis=1)
        _, pred = autoregressive_rollout(
            lambda a: self.model.apply(self.variables, a, training=False),
            seq, input_n_model=in_n, output_n_model=out_n,
            step_window=step, teacher_forcing=False,
            loss_per_sample=lambda p, g: jnp.zeros(p.shape[0]),
        )
        return pred[:, :horizon]
