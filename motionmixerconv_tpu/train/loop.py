"""Jitted train/eval steps and the epoch driver, TPU-first.

One ``jax.jit``-compiled function per phase (train step, val step, test step):
window gather, dim selection, scaling, forward, loss, backward and optimizer
update all fuse into a single XLA program per step; the corpus array never
leaves the device and no per-step host transfer happens except the scalar
metric accumulation at epoch end.

Batch padding: the reference's final ragged DataLoader batch is reproduced
with weight-0 padding rows (data/windows.py:batch_starts), and every loss /
metric here is computed per-sample then weight-averaged, which makes padded
results bit-equivalent to ragged-batch averages.

Reference call-stack parity: h36m/train_mixer_h36m.py:47-279 (train),
:282-417 (test_mpjpe), :420-469 (test_angle).
"""

from __future__ import annotations

import functools
import hashlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.constants import (
    H36M_INDEX_TO_EQUAL_EVAL,
    H36M_INDEX_TO_IGNORE_EVAL,
)
from ..data.windows import WindowedCorpus, batch_starts, gather_windows
from ..metrics.metrics import delta_2_gt
from ..geometry.rotations import expmap2rotmat, rotmat2euler
from .state import TrainState


def _per_sample_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) -> (B,): mean joint L2, D a multiple of 3."""
    b = pred.shape[0]
    diff = (gt - pred).reshape(b, -1, 3)
    return jnp.mean(jnp.linalg.norm(diff, axis=-1), axis=-1)


def _per_sample_l1_angle(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) -> (B,): mean over T of sum-abs over D (train loss, angle)."""
    return jnp.mean(jnp.sum(jnp.abs(pred - gt), axis=2), axis=1)


def _per_sample_euler(pred_ang: jnp.ndarray, gt_ang: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) expmap -> (B,): mean over T of the D-dim euler-diff norm."""
    b, t, d = pred_ang.shape
    pe = rotmat2euler(expmap2rotmat(pred_ang.reshape(-1, 3))).reshape(b, t, d)
    te = rotmat2euler(expmap2rotmat(gt_ang.reshape(-1, 3))).reshape(b, t, d)
    return jnp.mean(jnp.linalg.norm(pe - te, axis=-1), axis=-1)


def _per_sample_joint_angle(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.linalg.norm(gt - pred, axis=-1), axis=-1)


def _per_sample_auc_pck(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(B, T, J, 3) -> (B,): per-sample AUC of PCK over thresholds .001..0.3."""
    from ..metrics.metrics import auc_pck_from_dist

    dist = jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=-1))  # (B, T, J)
    return auc_pck_from_dist(dist, axis=(1, 2))


def _wmean(per_sample: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def _make_delta(seq_all: jnp.ndarray) -> jnp.ndarray:
    """Frame deltas with the reference's duplicated first step.

    Parity with test_mixer_h36m.py:64-72 / train_mixer_h36m.py:151-161: the
    delta list starts with (x1 - x0) and then appends (x_{i+1} - x_i) for all
    i, so delta[0] == delta[1] == x1 - x0.
    """
    d = seq_all[:, 1:] - seq_all[:, :-1]
    return jnp.concatenate([d[:, :1], d], axis=1)


class Trainer:
    """Direct (non-autoregressive) trainer for one model + corpus family.

    Args:
        model: flax module mapping (B, input_n, len(dim_used)) ->
            (B, output_n, len(dim_used)).
        optimizer: optax transformation (see train/optim.py).
        loss_type: 'mpjpe' | 'angle'.
        dim_used: indices into the corpus feature axis fed to the model.
        input_n / output_n: window split.
        input_scale: multiplier on model input (1/1000 for H36M xyz, which is
            in mm; 1.0 for AIS/AMASS, train_mixer_h36m.py:179).
        loss_scale: multiplier on the train loss (1000 for AMASS meters ->
            mm, train_mixer_amass.py:92).
        delta_x: velocity mode — model consumes frame deltas and predictions
            are decoded with a prefix sum (test_mixer_h36m.py:64-74).
        mesh: optional jax.sharding.Mesh with a 'data' axis for data-parallel
            execution; params are replicated, batches sharded.
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
        input_scale: float = 1.0,
        loss_scale: float = 1.0,
        delta_x: bool = False,
        mesh=None,
    ):
        if loss_type not in ("mpjpe", "angle"):
            raise ValueError(f"unknown loss_type {loss_type}")
        self.model = model
        self.optimizer = optimizer
        self.loss_type = loss_type
        self.dim_used = np.asarray(dim_used)
        self.input_n = input_n
        self.output_n = output_n
        self.input_scale = input_scale
        self.loss_scale = loss_scale
        self.delta_x = delta_x
        self.mesh = mesh
        self._batch_sharding = None
        self._replicated = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(mesh, P("data"))
            self._replicated = NamedSharding(mesh, P())

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        self._train_epoch_scan = jax.jit(self._train_epoch_scan_impl, donate_argnums=0)

    # ------------------------------------------------------------------ init

    def init_state(self, rng: jax.Array, sample_dim: Optional[int] = None) -> TrainState:
        d = sample_dim if sample_dim is not None else len(self.dim_used)
        init_rng, state_rng = jax.random.split(rng)
        variables = self.model.init(
            init_rng, jnp.zeros((2, self.input_n, d), jnp.float32), training=False
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.optimizer.init(params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            rng=state_rng,
        )
        if self._replicated is not None:
            state = jax.device_put(state, self._replicated)
        return state

    # ------------------------------------------------------------- data prep

    def _prepare(self, batch: jnp.ndarray):
        """Slice (B, L, D_full) into model input and dim_used ground truth."""
        seq = jnp.take(batch, jnp.asarray(self.dim_used), axis=2)
        seq_in = seq[:, : self.input_n]
        seq_gt = seq[:, self.input_n : self.input_n + self.output_n]
        if self.delta_x:
            delta = _make_delta(
                jnp.concatenate([seq_in, seq_gt], axis=1)
            )
            model_in = delta[:, : self.input_n]
            last = seq_in[:, -1, :]
            return model_in, seq_gt, last
        return seq_in * self.input_scale, seq_gt, None

    def _forward(self, variables, model_in, training, rng=None, mutable=False):
        kwargs = {}
        if training and rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        if mutable:
            out, updates = self.model.apply(
                variables, model_in, training=training, mutable=["batch_stats"], **kwargs
            )
            return out.astype(jnp.float32), updates
        out = self.model.apply(variables, model_in, training=training, **kwargs)
        # losses/metrics accumulate in f32 even under bf16 model compute
        return out.astype(jnp.float32), None

    # ------------------------------------------------------------ train step

    def _train_step_impl(self, state: TrainState, frames, starts, w):
        seq_len = self.input_n + self.output_n
        batch = gather_windows(frames, starts, seq_len)
        return self._train_step_on_batch(state, batch, w)

    def _train_step_on_batch(self, state: TrainState, batch, w):
        """One optimizer step on ALREADY-GATHERED (B, seq_len, D) windows —
        split from _train_step_impl so the prefetch-pipelined epoch scan can
        gather iteration i+1's windows while computing step i."""
        model_in, seq_gt, last = self._prepare(batch)
        rng, new_rng = jax.random.split(state.rng)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            if state.batch_stats:
                pred, updates = self.model.apply(
                    variables, model_in, training=True,
                    rngs={"dropout": rng}, mutable=["batch_stats"],
                )
            else:
                pred = self.model.apply(
                    variables, model_in, training=True, rngs={"dropout": rng}
                )
                updates = {}
            pred = pred.astype(jnp.float32)  # f32 loss under bf16 compute
            if self.delta_x:
                pred = delta_2_gt(pred, last)
            if self.loss_type == "mpjpe":
                per = _per_sample_mpjpe(pred, seq_gt)
            else:
                per = _per_sample_l1_angle(pred, seq_gt)
            loss = _wmean(per, w) * self.loss_scale
            new_bs = updates.get("batch_stats", state.batch_stats)
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            rng=new_rng,
        )
        return new_state, loss

    def _train_epoch_scan_impl(self, state: TrainState, frames, starts, w):
        """A whole epoch as one lax.scan over (n_batches, B) index arrays.

        One XLA dispatch per epoch instead of one per step — the per-step
        host->device dispatch latency (milliseconds on tunneled runtimes)
        disappears entirely. Returns weighted (loss_sum, weight_sum) so the
        epoch mean matches the reference's sample-weighted accumulation
        (train_mixer_h36m.py:195-197).
        """

        def step(carry, batch_idx):
            st = carry
            s, ww = batch_idx
            st, loss = self._train_step_impl(st, frames, s, ww)
            return st, (loss * jnp.sum(ww), jnp.sum(ww))

        state, (loss_sums, w_sums) = jax.lax.scan(step, state, (starts, w))
        return state, jnp.sum(loss_sums) / jnp.maximum(jnp.sum(w_sums), 1.0)

    def _train_epoch_scan_prefetch_impl(
        self, state: TrainState, frames, starts, w
    ):
        """The scan epoch with a one-batch window-gather prefetch pipeline.

        The row gather that fetches a step's windows is descriptor-cost-
        bound (~26 ns/row; `tools/probe.py gather` — 140 us at b50, 32% of
        the step) and sits on the critical path in the plain scan body.
        Here the scan carries the CURRENT step's pre-gathered windows and
        each iteration issues the NEXT batch's gather before computing, so
        the two have no data dependency and XLA's latency-hiding scheduler
        can overlap the gather DMAs with the step's MXU/VPU work.

        Numerically identical to _train_epoch_scan_impl: every step consumes
        the same windows and weights in the same order (the losses stream is
        bit-for-bit the plain scan's); the only extra work is one harmless
        wrapped-around prefetch on the last iteration (jnp.roll).
        """
        seq_len = self.input_n + self.output_n
        first = gather_windows(frames, starts[0], seq_len)

        def step(carry, batch_idx):
            st, window = carry
            next_starts, ww = batch_idx
            nxt = gather_windows(frames, next_starts, seq_len)
            st, loss = self._train_step_on_batch(st, window, ww)
            return (st, nxt), (loss * jnp.sum(ww), jnp.sum(ww))

        (state, _), (loss_sums, w_sums) = jax.lax.scan(
            step, (state, first), (jnp.roll(starts, -1, axis=0), w))
        return state, jnp.sum(loss_sums) / jnp.maximum(jnp.sum(w_sums), 1.0)

    # ------------------------------------------------------------ epoch APIs

    def _put_batch(self, starts, w):
        starts = jnp.asarray(starts)
        w = jnp.asarray(w)
        if self._batch_sharding is not None:
            starts = jax.device_put(starts, self._batch_sharding)
            w = jax.device_put(w, self._batch_sharding)
        return starts, w

    def _put_epoch_batches(self, *arrays):
        """Shard stacked (n_batches, B, ...) index arrays as P(None, 'data').

        Shared by every scan-over-batches path (train epoch, AR train epoch,
        grouped eval) so that under a mesh each scanned batch is split across
        the 'data' axis and XLA inserts the gradient/metric all-reduces.
        """
        out = [jnp.asarray(a) for a in arrays]
        if self._batch_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P(None, "data"))
            out = [jax.device_put(a, sh) for a in out]
        return out if len(out) > 1 else out[0]

    def train_epoch(
        self, state: TrainState, corpus: WindowedCorpus, frames, batch_size: int,
        seed: int, scan: bool = True, order: Optional[np.ndarray] = None,
    ) -> tuple[TrainState, float]:
        """One epoch over shuffled windows.

        ``scan=True`` (default) runs the whole epoch as a single jitted
        lax.scan dispatch; ``scan=False`` dispatches per step (useful for
        debugging / host-side callbacks between steps). ``order`` replaces
        the shuffle with an explicit window permutation (lockstep parity
        runs against a recorded reference batch stream).
        """
        if scan:
            all_starts, all_w = [], []
            for starts, w in batch_starts(corpus, batch_size, shuffle=True,
                                          seed=seed, order=order):
                all_starts.append(starts)
                all_w.append(w)
            starts, w = self._put_epoch_batches(np.stack(all_starts), np.stack(all_w))
            state, mean_loss = self._train_epoch_scan(state, frames, starts, w)
            return state, float(mean_loss)

        total, n = 0.0, 0
        for starts, w in batch_starts(corpus, batch_size, shuffle=True,
                                      seed=seed, order=order):
            starts, w = self._put_batch(starts, w)
            k = int(np.sum(np.asarray(w) > 0))
            state, loss = self._train_step(state, frames, starts, w)
            total += float(loss) * k
            n += k
        return state, total / max(n, 1)

    def _stack_eval_batches(self, window_starts: np.ndarray,
                            group_ids: np.ndarray, batch_size: int):
        """Pad + reshape eval windows into (n_batches, bs) scan operands."""
        n = len(window_starts)
        bs = min(batch_size, n)
        if self.mesh is not None:
            # sharded batches must divide the 'data' axis; round the batch
            # up (weight-0 padding absorbs the extra rows) so small corpora
            # don't produce an unshardable (n_batches, n) array
            axis = self.mesh.shape["data"]
            bs = min(batch_size, ((bs + axis - 1) // axis) * axis)
        n_batches = (n + bs - 1) // bs
        pad = n_batches * bs - n
        starts = np.concatenate([window_starts, np.zeros(pad, np.int64)])
        w = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
        gids = np.concatenate([group_ids, np.zeros(pad, np.int64)])
        return self._put_epoch_batches(
            starts.reshape(n_batches, bs).astype(np.int32),
            w.reshape(n_batches, bs),
            gids.reshape(n_batches, bs).astype(np.int32),
        )

    def evaluate_grouped(
        self, state: TrainState, frames, window_starts: np.ndarray,
        group_ids: np.ndarray, n_groups: int, batch_size: int, kind: str,
    ):
        """Grouped (e.g. per-action) evaluation in ONE jitted scan dispatch.

        The reference evaluates each action with its own dataset + loader
        (train_mixer_h36m.py:311-323); here every group's windows live in one
        corpus and per-group sums come from segment reductions inside a
        single lax.scan over batches.

        Returns (m1_per_group, m2_per_group, n_per_group) numpy arrays.
        """
        starts, w, gids = self._stack_eval_batches(
            window_starts, group_ids, batch_size)

        run = self._grouped_fn(kind, n_groups)
        stacked = np.asarray(run(state.variables(), frames, starts, w, gids))
        return stacked[0], stacked[1], stacked[2]

    def _grouped_fn(self, kind: str, n_groups: int):
        """Cached jitted scan for grouped eval (one compile per kind/groups)."""
        if not hasattr(self, "_grouped_cache"):
            self._grouped_cache = {}
        key = (kind, n_groups)
        if key in self._grouped_cache:
            return self._grouped_cache[key]
        per_sample_fn = self._per_sample_for_kind(kind)

        @jax.jit
        def run(variables, frames, starts, w, gids):
            def step(carry, batch):
                s, ww, gg = batch
                per1, per2 = per_sample_fn(variables, frames, s)
                m1 = jax.ops.segment_sum(per1 * ww, gg, num_segments=n_groups)
                m2 = jax.ops.segment_sum(per2 * ww, gg, num_segments=n_groups)
                nn = jax.ops.segment_sum(ww, gg, num_segments=n_groups)
                c1, c2, cn = carry
                return (c1 + m1, c2 + m2, cn + nn), None

            zero = jnp.zeros((n_groups,), jnp.float32)
            (m1, m2, nn), _ = jax.lax.scan(step, (zero, zero, zero), (starts, w, gids))
            # one stacked result = ONE device->host transfer on the tunneled
            # runtime (three separate fetches each pay the relay round trip)
            return jnp.stack([m1, m2, nn])

        self._grouped_cache[key] = run
        return run

    def register_eval_kind(self, name: str, per_sample_fn) -> None:
        """Register a custom per-sample eval: fn(variables, frames, starts) ->
        (per1, per2), usable as ``kind`` in evaluate/evaluate_grouped (e.g.
        the AMASS 22-joint-scatter test in cli/_runner.py)."""
        if not hasattr(self, "_custom_kinds"):
            self._custom_kinds = {}
        self._custom_kinds[name] = per_sample_fn

    def _per_sample_for_kind(self, kind: str):
        custom = getattr(self, "_custom_kinds", {})
        if kind in custom:
            return custom[kind]
        return {
            "val": self._val_per_sample,
            "h36m_xyz": self._test_h36m_xyz_per_sample,
            "h36m_angle": self._test_h36m_angle_per_sample,
            "simple": self._test_simple_per_sample,
        }[kind]

    def _val_per_sample(self, variables, frames, starts):
        """Per-sample validation loss (duplicated into both metric slots)."""
        seq_len = self.input_n + self.output_n
        batch = gather_windows(frames, starts, seq_len)
        model_in, seq_gt, last = self._prepare(batch)
        pred, _ = self._forward(variables, model_in, training=False)
        if self.delta_x:
            pred = delta_2_gt(pred, last)
        if self.loss_type == "mpjpe":
            per = _per_sample_mpjpe(pred, seq_gt) * self.loss_scale
        else:
            full_gt = batch[:, self.input_n : self.input_n + self.output_n]
            all_joints = full_gt.at[:, :, jnp.asarray(self.dim_used)].set(pred)
            per = _per_sample_euler(all_joints, full_gt)
        return per, per

    def validate(self, state: TrainState, corpus: WindowedCorpus, frames,
                 batch_size: int) -> float:
        """Validation loss over the corpus in one scanned dispatch."""
        m1, _, nn = self.evaluate_grouped(
            state, frames, corpus.window_starts,
            np.zeros(len(corpus), np.int64), 1, batch_size, "val",
        )
        return float(m1[0] / max(nn[0], 1.0))

    # per-sample variants of the test metrics (shared by evaluate/evaluate_grouped)

    def _test_h36m_xyz_per_sample(self, variables, frames, starts):
        """Full-skeleton 32-joint MPJPE + 22-joint AUC-PCK per sample.

        Parity: train_mixer_h36m.py:324-397.
        """
        seq_len = self.input_n + self.output_n
        batch = gather_windows(frames, starts, seq_len)
        model_in, seq_gt, last = self._prepare(batch)
        pred, _ = self._forward(variables, model_in, training=False)
        if self.delta_x:
            pred = delta_2_gt(pred, last)
        full_gt = batch[:, self.input_n : self.input_n + self.output_n]
        dim_used = jnp.asarray(self.dim_used)
        ignore = jnp.asarray(H36M_INDEX_TO_IGNORE_EVAL)
        equal = jnp.asarray(H36M_INDEX_TO_EQUAL_EVAL)
        all_seq = full_gt.at[:, :, dim_used].set(pred)
        all_seq = all_seq.at[:, :, ignore].set(all_seq[:, :, equal])
        all_gt = full_gt.at[:, :, ignore].set(full_gt[:, :, equal])
        b = all_seq.shape[0]
        per_mpjpe = _per_sample_mpjpe(
            all_seq.reshape(b, self.output_n, 32, 3),
            all_gt.reshape(b, self.output_n, 32, 3),
        )
        per_auc = _per_sample_auc_pck(
            pred.reshape(b, self.output_n, -1, 3) / 1000.0,
            seq_gt.reshape(b, self.output_n, -1, 3) / 1000.0,
        )
        return per_mpjpe, per_auc

    def _test_h36m_angle_per_sample(self, variables, frames, starts):
        """Euler + joint-angle per-sample errors (train_mixer_h36m.py:445-463)."""
        seq_len = self.input_n + self.output_n
        batch = gather_windows(frames, starts, seq_len)
        model_in, seq_gt, last = self._prepare(batch)
        pred, _ = self._forward(variables, model_in, training=False)
        full_gt = batch[:, self.input_n : self.input_n + self.output_n]
        all_seq = full_gt.at[:, :, jnp.asarray(self.dim_used)].set(pred)
        return _per_sample_euler(all_seq, full_gt), _per_sample_joint_angle(all_seq, full_gt)

    def _test_simple_per_sample(self, variables, frames, starts):
        """dim_used-space MPJPE + AUC-PCK per sample (train_mixer_ais.py:340-357)."""
        seq_len = self.input_n + self.output_n
        batch = gather_windows(frames, starts, seq_len)
        model_in, seq_gt, last = self._prepare(batch)
        pred, _ = self._forward(variables, model_in, training=False)
        if self.delta_x:
            pred = delta_2_gt(pred, last)
        b = pred.shape[0]
        per_mpjpe = _per_sample_mpjpe(pred, seq_gt) * self.loss_scale
        per_auc = _per_sample_auc_pck(
            pred.reshape(b, self.output_n, -1, 3),
            seq_gt.reshape(b, self.output_n, -1, 3),
        )
        return per_mpjpe, per_auc

    # --------------------------------------------------- fused epoch chunks

    def _epoch_train_impl_for(self, teacher_forcing):
        """The (state, frames, starts, w) -> (state, loss) epoch impl used by
        the fused multi-epoch scan; AutoregressiveTrainer overrides this to
        bind its static teacher_forcing flag."""
        return self._train_epoch_scan_impl

    def _fused_epochs_fn(self, kind: str, n_groups: int, teacher_forcing):
        """Cached jit of K epochs (train + val + grouped test) in ONE program."""
        if not hasattr(self, "_fused_cache"):
            self._fused_cache = {}
        key = (kind, n_groups, teacher_forcing)
        if key in self._fused_cache:
            return self._fused_cache[key]
        train_impl = self._epoch_train_impl_for(teacher_forcing)
        # "val" resolves polymorphically: the AR trainer's validation is a
        # closed-loop rollout (_ar_val_per_sample), not the direct val loss
        val_fn = self._per_sample_for_kind("val")
        per_sample_fn = self._per_sample_for_kind(kind)

        @functools.partial(jax.jit, donate_argnums=0)
        def run(state, frames, ep_starts, ep_w, vframes, v_starts, v_w,
                tframes, t_starts, t_w, t_gids):
            def epoch_body(st, xs):
                es, ew = xs
                st, train_loss = train_impl(st, frames, es, ew)
                variables = st.variables()

                def vstep(c, b):
                    s, ww = b
                    per, _ = val_fn(variables, vframes, s)
                    return (c[0] + jnp.sum(per * ww), c[1] + jnp.sum(ww)), None

                zero = jnp.zeros((), jnp.float32)
                (vsum, vn), _ = jax.lax.scan(vstep, (zero, zero), (v_starts, v_w))
                val_loss = vsum / jnp.maximum(vn, 1.0)

                def tstep(c, b):
                    s, ww, gg = b
                    p1, p2 = per_sample_fn(variables, tframes, s)
                    c1, c2, cn = c
                    return (
                        c1 + jax.ops.segment_sum(p1 * ww, gg, num_segments=n_groups),
                        c2 + jax.ops.segment_sum(p2 * ww, gg, num_segments=n_groups),
                        cn + jax.ops.segment_sum(ww, gg, num_segments=n_groups),
                    ), None

                gzero = jnp.zeros((n_groups,), jnp.float32)
                (m1, m2, nn), _ = jax.lax.scan(
                    tstep, (gzero, gzero, gzero), (t_starts, t_w, t_gids))
                return st, (train_loss, val_loss, m1, m2, nn)

            state, outs = jax.lax.scan(epoch_body, state, (ep_starts, ep_w))
            return state, outs

        self._fused_cache[key] = run
        return run

    def run_epochs_fused(
        self, state: TrainState, corpus: WindowedCorpus, frames,
        batch_size: int, seeds, vald: WindowedCorpus, vframes,
        tframes, test_starts: np.ndarray, test_gids: np.ndarray,
        n_groups: int, test_kind: str, batch_size_test: int,
        teacher_forcing=None,
    ):
        """Run ``len(seeds)`` whole epochs — train + val + grouped test each —
        as ONE XLA dispatch (``lax.scan`` over epochs around the existing
        scan-over-batches phase impls).

        TPU-native rationale: the reference (and the default per-epoch path)
        pays 3 dispatches + host syncs per epoch plus a params fetch for the
        per-epoch checkpoint; on a tunneled runtime each sync is a ~28-30 ms
        relay round trip, which dominates the 0.2 s of actual device work per
        epoch. Chunking K epochs into one program amortizes that to 1 sync
        per chunk while returning bit-identical per-epoch scalar histories
        (the per-epoch metric arrays come back stacked).

        ``seeds``: one shuffle seed per epoch (the default driver uses the
        epoch index, matching train_epoch(seed=epoch)).
        ``teacher_forcing``: None for the direct trainer; True/False for the
        autoregressive trainer (a chunk must not straddle the TF boundary —
        the flag is static in the compiled program).

        Returns (state, per-epoch dict) where each entry is a numpy array of
        leading dimension K: train/val losses and per-group test sums
        (m1, m2, n) matching evaluate_grouped's accumulators.
        """
        all_starts, all_w = [], []
        for seed in seeds:
            ep_s, ep_w = [], []
            for starts, w in batch_starts(corpus, batch_size, shuffle=True,
                                          seed=seed):
                ep_s.append(starts)
                ep_w.append(w)
            all_starts.append(np.stack(ep_s))
            all_w.append(np.stack(ep_w))
        ep_starts = np.stack(all_starts)  # (K, n_batches, B)
        ep_w = np.stack(all_w)
        if self._batch_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P(None, None, "data"))
            ep_starts = jax.device_put(jnp.asarray(ep_starts), sh)
            ep_w = jax.device_put(jnp.asarray(ep_w), sh)
        else:
            ep_starts = jnp.asarray(ep_starts)
            ep_w = jnp.asarray(ep_w)

        # the val/test eval index stacks depend only on the (fixed) window
        # sets and batch sizes — cache them across chunks so a K-epoch run
        # doesn't re-stack and re-upload identical arrays every chunk (each
        # host->device transfer is a ~28-30 ms relay trip on the tunneled
        # runtime this path exists to amortize). Keyed on CONTENT, not id():
        # CPython recycles ids after GC, so an equal-length fresh corpus
        # could otherwise silently hit a stale stack.
        def _content_key(a):
            a = np.asarray(a)
            return (a.shape, a.dtype.str,
                    hashlib.sha1(a.tobytes()).hexdigest())

        ck = (_content_key(vald.window_starts), batch_size,
              _content_key(test_starts), _content_key(test_gids),
              batch_size_test)
        cached = getattr(self, "_fused_eval_stacks", None)
        if cached is None or cached[0] != ck:
            v_starts, v_w, _ = self._stack_eval_batches(
                vald.window_starts, np.zeros(len(vald), np.int64), batch_size)
            t_starts, t_w, t_gids_d = self._stack_eval_batches(
                test_starts, test_gids, batch_size_test)
            self._fused_eval_stacks = (
                ck, (v_starts, v_w, t_starts, t_w, t_gids_d))
        _, (v_starts, v_w, t_starts, t_w, t_gids) = self._fused_eval_stacks

        run = self._fused_epochs_fn(test_kind, n_groups, teacher_forcing)
        state, (tl, vl, m1, m2, nn) = run(
            state, frames, ep_starts, ep_w, vframes, v_starts, v_w,
            tframes, t_starts, t_w, t_gids)
        return state, {
            "train": np.asarray(tl), "val": np.asarray(vl),
            "m1": np.asarray(m1), "m2": np.asarray(m2), "n": np.asarray(nn),
        }

    def evaluate(
        self, state: TrainState, corpus: WindowedCorpus, frames, batch_size: int,
        kind: str = "val",
    ):
        """kind: 'val' -> scalar loss; 'h36m_xyz'/'h36m_angle'/'simple' (or a
        registered custom kind) -> (metric1, metric2) per the matching test.

        One scanned dispatch over all batches (evaluate_grouped with a single
        group) — no per-batch host round-trips on high-latency runtimes.
        """
        m1, m2, nn = self.evaluate_grouped(
            state, frames, corpus.window_starts,
            np.zeros(len(corpus), np.int64), 1, batch_size, kind,
        )
        if kind == "val":
            return float(m1[0] / max(nn[0], 1.0))
        return float(m1[0] / max(nn[0], 1.0)), float(m2[0] / max(nn[0], 1.0))
