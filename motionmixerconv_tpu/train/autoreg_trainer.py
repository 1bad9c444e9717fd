"""Trainer for autoregressive (sliding-window rollout) models.

Mirrors h36m/train_autoreg_mixer_h36m.py: teacher forcing for the first
``n_epochs_teacher_forcing`` epochs (:122-125), closed loop afterwards;
validation and test always run closed loop (:153, :322). Note the reference
feeds unscaled (mm) sequences in this path — there is no /1000 in
``autoregressive_process_batch`` — and the test metric is the rollout loss in
dim_used space plus AUC-PCK (:322-338), not the full-skeleton MPJPE.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.windows import WindowedCorpus, batch_starts, gather_windows
from .autoregressive import autoregressive_rollout
from .loop import (
    Trainer,
    _per_sample_auc_pck,
    _per_sample_euler,
    _per_sample_joint_angle,
    _per_sample_l1_angle,
    _per_sample_mpjpe,
    _wmean,
)
from .state import TrainState


class AutoregressiveTrainer(Trainer):
    """Extends Trainer with rollout-based train/val/test steps.

    Extra args (parity with the reference autoregressive CLI):
        input_n_model / output_n_model: the model's window geometry.
        step_window: rollout stride.
    ``input_n``/``output_n`` are the *dataset* window geometry
    (input_n_dataset / output_n_dataset in the reference).
    """

    def __init__(
        self,
        model,
        optimizer: optax.GradientTransformation,
        *,
        loss_type: str,
        dim_used: np.ndarray,
        input_n: int,
        output_n: int,
        input_n_model: int,
        output_n_model: int,
        step_window: int,
        input_scale: float = 1.0,
        loss_scale: float = 1.0,
        auc_scale: float = 1e-3,
        mesh=None,
    ):
        super().__init__(
            model, optimizer, loss_type=loss_type, dim_used=dim_used,
            input_n=input_n, output_n=output_n, input_scale=input_scale,
            loss_scale=loss_scale, mesh=mesh,
        )
        self.input_n_model = input_n_model
        self.output_n_model = output_n_model
        self.step_window = step_window
        # h36m autoreg AUC-PCK divides by 1000 (train_autoreg_mixer_h36m.py:327-329);
        # the AIS variant does not (train_autoreg_mixer_ais.py:266-268) -> pass 1.0.
        self.auc_scale = auc_scale
        self._train_step_tf = jax.jit(
            lambda s, f, st, w: self._ar_train_impl(s, f, st, w, True),
            donate_argnums=0,
        )
        self._train_step_cl = jax.jit(
            lambda s, f, st, w: self._ar_train_impl(s, f, st, w, False),
            donate_argnums=0,
        )
        self._epoch_scan_tf = jax.jit(
            lambda s, f, st, w: self._ar_epoch_scan_impl(s, f, st, w, True),
            donate_argnums=0,
        )
        self._epoch_scan_cl = jax.jit(
            lambda s, f, st, w: self._ar_epoch_scan_impl(s, f, st, w, False),
            donate_argnums=0,
        )

    def init_state(self, rng, sample_dim: Optional[int] = None) -> TrainState:
        d = sample_dim if sample_dim is not None else len(self.dim_used)
        init_rng, state_rng = jax.random.split(rng)
        variables = self.model.init(
            init_rng,
            jnp.zeros((2, self.input_n_model, d), jnp.float32),
            training=False,
        )
        params = variables["params"]
        opt_state = self.optimizer.init(params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=opt_state, rng=state_rng,
        )
        if self._replicated is not None:
            state = jax.device_put(state, self._replicated)
        return state

    def _loss_per_sample(self):
        if self.loss_type == "mpjpe":
            return _per_sample_mpjpe
        return _per_sample_l1_angle

    def _rollout(self, variables, seq, teacher_forcing, rng=None, training=False):
        has_bs = isinstance(variables, dict) and bool(variables.get("batch_stats"))

        def apply_fn(x):
            kwargs = {"rngs": {"dropout": rng}} if (training and rng is not None) else {}
            if training and has_bs:
                # train-mode BatchNorm normalizes with batch statistics and
                # wants to write running stats; inside the rollout those
                # per-step updates are discarded (see _ar_train_impl for the
                # once-per-step stats harvest).
                out, _ = self.model.apply(
                    variables, x, training=True, mutable=["batch_stats"], **kwargs
                )
                return out.astype(jnp.float32)
            # f32 feedback + loss even under bf16 model compute
            out = self.model.apply(variables, x, training=training, **kwargs)
            return out.astype(jnp.float32)

        return autoregressive_rollout(
            apply_fn, seq,
            input_n_model=self.input_n_model,
            output_n_model=self.output_n_model,
            step_window=self.step_window,
            teacher_forcing=teacher_forcing,
            loss_per_sample=self._loss_per_sample(),
        )

    # ----------------------------------------------------------------- steps

    def _ar_train_impl(self, state, frames, starts, w, teacher_forcing):
        seq_len = self.input_n + self.output_n
        batch = gather_windows(frames, starts, seq_len)
        seq = jnp.take(batch, jnp.asarray(self.dim_used), axis=2) * self.input_scale
        rng, new_rng = jax.random.split(state.rng)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            per_sample, _ = self._rollout(
                variables, seq, teacher_forcing, rng=rng, training=True
            )
            return _wmean(per_sample, w) * self.loss_scale

        if state.batch_stats:
            # BatchNorm running stats: harvested from one training-mode
            # forward on the first window per optimizer step (a stats carry
            # through the rollout scan would leak tracers; the reference also
            # updates stats once per step, over its own batch composition).
            _, bs_updates = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                seq[:, : self.input_n_model],
                training=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            new_bs = bs_updates.get("batch_stats", state.batch_stats)
        else:
            new_bs = state.batch_stats

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = self.optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1, params=new_params, batch_stats=new_bs,
                opt_state=new_opt, rng=new_rng,
            ),
            loss,
        )

    def _ar_epoch_scan_impl(self, state, frames, starts, w, teacher_forcing):
        """Whole epoch as one lax.scan dispatch (cf. Trainer._train_epoch_scan_impl)."""

        def step(carry, batch_idx):
            s, ww = batch_idx
            st, loss = self._ar_train_impl(carry, frames, s, ww, teacher_forcing)
            return st, (loss * jnp.sum(ww), jnp.sum(ww))

        state, (loss_sums, w_sums) = jax.lax.scan(step, state, (starts, w))
        return state, jnp.sum(loss_sums) / jnp.maximum(jnp.sum(w_sums), 1.0)

    def _ar_test_per_sample(self, variables, frames, starts):
        """Per-sample rollout test (train_autoreg_mixer_h36m.py:261-357,:360-412).

        mpjpe: (rollout mpjpe, AUC-PCK of the stitched prediction, scaled by
        ``auc_scale``). angle: (euler, joint-angle) on the full frame.
        """
        seq_len = self.input_n + self.output_n
        batch = gather_windows(frames, starts, seq_len)
        seq = jnp.take(batch, jnp.asarray(self.dim_used), axis=2) * self.input_scale
        per_loss, full_pred = self._rollout(variables, seq, teacher_forcing=False)
        gt = seq[:, self.input_n :]
        b = gt.shape[0]
        if self.loss_type == "mpjpe":
            per_metric = _per_sample_auc_pck(
                full_pred.reshape(b, self.output_n, -1, 3) * self.auc_scale,
                gt.reshape(b, self.output_n, -1, 3) * self.auc_scale,
            )
        else:
            full_gt = batch[:, self.input_n :]
            all_seq = full_gt.at[:, :, jnp.asarray(self.dim_used)].set(full_pred)
            per_loss = _per_sample_euler(all_seq, full_gt)
            per_metric = _per_sample_joint_angle(all_seq, full_gt)
        return per_loss, per_metric

    def _ar_val_per_sample(self, variables, frames, starts):
        seq_len = self.input_n + self.output_n
        batch = gather_windows(frames, starts, seq_len)
        seq = jnp.take(batch, jnp.asarray(self.dim_used), axis=2) * self.input_scale
        per_sample, _ = self._rollout(variables, seq, teacher_forcing=False)
        per = per_sample * self.loss_scale
        return per, per

    def _per_sample_for_kind(self, kind: str):
        if kind == "ar":
            return self._ar_test_per_sample
        if kind == "val":
            return self._ar_val_per_sample
        return super()._per_sample_for_kind(kind)

    # ------------------------------------------------------------ epoch APIs

    def _epoch_train_impl_for(self, teacher_forcing):
        """Bind the static TF flag for the fused multi-epoch scan (a chunk
        is all-TF or all-closed-loop; the runner splits at the boundary)."""
        if teacher_forcing is None:
            raise ValueError(
                "AutoregressiveTrainer.run_epochs_fused needs an explicit "
                "teacher_forcing flag per chunk")

        def impl(st, frames, starts, w):
            return self._ar_epoch_scan_impl(st, frames, starts, w, teacher_forcing)

        return impl

    def train_epoch_ar(
        self, state, corpus: WindowedCorpus, frames, batch_size: int, seed: int,
        teacher_forcing: bool, scan: bool = True,
    ):
        if scan:
            all_starts, all_w = [], []
            for starts, w in batch_starts(corpus, batch_size, shuffle=True, seed=seed):
                all_starts.append(starts)
                all_w.append(w)
            # same P(None, 'data') epoch sharding as Trainer.train_epoch —
            # under a mesh, each scanned AR batch is split over 'data'.
            starts, w = self._put_epoch_batches(np.stack(all_starts), np.stack(all_w))
            fn = self._epoch_scan_tf if teacher_forcing else self._epoch_scan_cl
            state, mean_loss = fn(state, frames, starts, w)
            mean_loss = float(mean_loss)
            if not np.isfinite(mean_loss):
                # parity with the reference guardrail `assert not isnan(loss)`
                # (train_autoreg_mixer_h36m.py:256): closed-loop gradients can
                # explode through the feedback rollout — pass clip_grad.
                raise FloatingPointError(
                    "Loss is nan — closed-loop rollout diverged "
                    "(try --clip_grad or more teacher-forcing epochs)"
                )
            return state, mean_loss

        step = self._train_step_tf if teacher_forcing else self._train_step_cl
        total, n = 0.0, 0
        for starts, w in batch_starts(corpus, batch_size, shuffle=True, seed=seed):
            starts, w = self._put_batch(starts, w)
            k = int(np.sum(np.asarray(w) > 0))
            state, loss = step(state, frames, starts, w)
            total += float(loss) * k
            n += k
        return state, total / max(n, 1)

    def evaluate_ar(self, state, corpus: WindowedCorpus, frames, batch_size: int,
                    kind: str = "val"):
        """Closed-loop val loss / rollout test in one scanned dispatch.

        kind: 'val' -> scalar rollout loss; 'test' -> (loss, metric) per
        _ar_test_per_sample. Routed through evaluate_grouped (single group)
        so no per-batch dispatch latency is paid.
        """
        grouped_kind = "val" if kind == "val" else "ar"
        m1, m2, nn = self.evaluate_grouped(
            state, frames, corpus.window_starts,
            np.zeros(len(corpus), np.int64), 1, batch_size, grouped_kind,
        )
        if kind == "val":
            return float(m1[0] / max(nn[0], 1.0))
        return float(m1[0] / max(nn[0], 1.0)), float(m2[0] / max(nn[0], 1.0))
