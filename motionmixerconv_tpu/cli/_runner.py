"""Shared training-run drivers behind the CLI entry points.

Each ``run_*`` function reproduces the corresponding reference trainer's
behaviour (epoch loop, per-epoch val+test, TensorBoard scalars, per-epoch
checkpoint) on top of the jitted Trainer/AutoregressiveTrainer.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import AISDataset, AMASSDataset, H36MDataset
from ..data.constants import (
    AIS_DIM_USED,
    AIS_TEST_ACTIONS,
    AIS_TRAIN_ACTIONS,
    AIS_VAL_ACTIONS,
    H36M_DIM_USED_ANGLE,
    H36M_DIM_USED_XYZ,
    define_actions,
)
from ..logging import MetricLogger
from ..profiling import profile_dir_from_env, profile_trace
from ..models import ConvMixer, MlpMixer
from ..train import Trainer, make_optimizer, save_checkpoint
from ..train.autoreg_trainer import AutoregressiveTrainer

AMASS_DIM_USED = np.arange(12, 66)  # joints 4..21 of the flat (52*3) frame


def enable_compilation_cache() -> None:
    """Opt-in persistent XLA compilation cache (set MMC_COMPILE_CACHE=<dir>).

    Off by default: under the axon remote-compile TPU backend, reloading a
    persisted executable was observed to deadlock the first dispatched step
    (hang in Array.__array__ waiting on the device), so only enable this on
    platforms where it is known-good (e.g. CPU or direct TPU runtimes).
    """
    cache_dir = os.environ.get("MMC_COMPILE_CACHE", "")
    if cache_dir and cache_dir != "0":
        os.makedirs(cache_dir, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass


enable_compilation_cache()


def build_conv_mixer(args, dim_in: int, dim_out: int, in_ntp: int, out_ntp: int) -> ConvMixer:
    """ConvMixer from CLI flags (train_mixer_h36m.py:575-595 defaults)."""
    return ConvMixer(
        num_blocks=args.num_blocks,
        dimPosIn=dim_in,
        dimPosEmb=args.hidden_dim,
        dimPosOut=dim_out,
        in_nTP=in_ntp,
        out_nTP=out_ntp,
        conv_nChan=getattr(args, "conv_nChan", 1),
        conv1_kernel_shape=tuple(getattr(args, "conv1_kernel_shape", (1, 3))),
        conv1_stride=(1, 1),
        conv1_padding=None,
        mode_conv=getattr(args, "mode_conv", "twice"),
        activation=args.activation,
        regularization=args.regularization,
        use_se=True,
        r_se=args.r_se,
        use_max_pooling=False,
        encoder_n_harmonic_functions=getattr(args, "encoder_n_harmonic_functions", 64),
        encoder_omega0=getattr(args, "encoder_omega0", 0.1),
        encoder_fused=getattr(args, "fused_encoder", False),
        encoder_harmonic_impl=getattr(args, "harmonic_impl", "direct"),
        encoder_embed_dtype=(
            jnp.bfloat16
            if getattr(args, "embed_dtype", "f32") == "bf16" else None),
    )


def build_mlp_mixer(args, dim: int, in_ntp: int, out_ntp: int) -> MlpMixer:
    """MlpMixer from CLI flags (amass/train_mixer_amass.py:250-258 defaults)."""
    return MlpMixer(
        num_classes=dim,
        num_blocks=args.num_blocks,
        hidden_dim=args.hidden_dim,
        tokens_mlp_dim=args.tokens_mlp_dim,
        channels_mlp_dim=args.channels_mlp_dim,
        seq_len=in_ntp,
        pred_len=out_ntp,
        activation=args.activation,
        regularization=args.regularization,
        input_size=dim,
        r_se=args.r_se,
        use_max_pooling=False,
        use_se=True,
    )


def model_from_checkpoint_meta(meta: dict):
    """(model, sample_shape) rebuilt from a checkpoint's stored training
    args (``train.state.save_checkpoint`` meta) — works for every trainer
    family: H36M direct/angle, autoregressive (``*_model`` window args),
    AIS (``conv1_kernel_shape`` set by its CLI), AMASS (MlpMixer, no
    ``model_type`` flag)."""
    from types import SimpleNamespace

    args = SimpleNamespace(**meta)
    in_n = meta.get("input_n_model", meta.get("input_n", 10))
    out_n = meta.get("output_n_model", meta.get("output_n", 25))
    if meta.get("loss_type") == "angle" and "actions_to_consider" in meta:
        dim = len(H36M_DIM_USED_ANGLE)  # H36M angle trainers use 48 dims
    else:
        dim = meta.get("pose_dim", 66)
    model_type = meta.get("model_type")
    if model_type is None:
        # trainers without the flag: AIS builds ConvMixer (kernel flags),
        # AMASS builds MlpMixer
        model_type = "conv" if ("conv1_kernel_shape" in meta
                                or "conv_nChan" in meta
                                or "kernel1_x" in meta) else "mlp"
    if model_type == "mlp":
        return build_mlp_mixer(args, dim, in_n, out_n), (1, in_n, dim)
    return build_conv_mixer(args, dim, dim, in_n, out_n), (1, in_n, dim)


def _log_dir(args, model_name: str) -> str:
    log_dir = os.path.join(args.save_path, model_name)
    if (os.path.exists(log_dir) and os.listdir(log_dir)
            and not getattr(args, "resume", None)):
        # parity with train_mixer_h36m.py:50-55; a --resume run is allowed to
        # continue in its own (existing) directory
        raise ValueError(
            "The directory already exists. Please, change the name of the model",
            log_dir,
        )
    os.makedirs(log_dir, exist_ok=True)
    return log_dir


def param_count(state) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(state.params))


def _steps_per_epoch(n: int, batch_size: int) -> int:
    return max(1, (n + batch_size - 1) // batch_size)


def _apply_init_variables(trainer, state, init_variables):
    """Replace a fresh state's params (and batch_stats) with externally
    provided variables — e.g. a converted torch init for matched-init
    convergence runs (tools/parity_runs.py) — re-initializing the optimizer
    state for the new params."""
    if init_variables is None:
        return state
    params = init_variables["params"]
    return state.replace(
        params=params,
        batch_stats=init_variables.get("batch_stats", state.batch_stats),
        opt_state=trainer.optimizer.init(params),
    )



def _combine_test_sets(test_sets):
    """Concatenate per-action corpora into one (frames, starts, group_ids)."""
    frames_list, starts_list, gid_list = [], [], []
    off = 0
    for gi, ds in enumerate(test_sets.values()):
        frames_list.append(ds.frames)
        starts_list.append(ds.window_starts + off)
        gid_list.append(np.full(len(ds), gi, np.int64))
        off += ds.frames.shape[0]
    return (
        jnp.asarray(np.concatenate(frames_list)),
        np.concatenate(starts_list),
        np.concatenate(gid_list),
        list(test_sets.keys()),
    )

def export_h36m_visualizations(trainer, state, test_set, log_dir: str,
                               action: str, n_windows: int = 2) -> list:
    """Render prediction-vs-gt GIFs for a few test windows.

    Parity with the save_results path of test_mpjpe
    (train_mixer_h36m.py:399-411): full-skeleton prediction (equal-joint
    re-inserted) in yellow over blue ground truth, preceded by the blue
    input frames.
    """
    import jax.numpy as jnp

    from ..data.constants import (
        H36M_INDEX_TO_EQUAL_EVAL,
        H36M_INDEX_TO_IGNORE_EVAL,
    )
    from ..data.windows import gather_windows
    from ..viz import visualize_batch

    frames = jnp.asarray(test_set.frames)
    starts = jnp.asarray(test_set.window_starts[10 : 10 + n_windows].astype(np.int32))
    seq_len = trainer.input_n + trainer.output_n
    batch = gather_windows(frames, starts, seq_len)
    model_in, seq_gt, last = trainer._prepare(batch)
    pred = trainer.model.apply(state.variables(), model_in, training=False)
    if trainer.delta_x:
        from ..metrics.metrics import delta_2_gt

        pred = delta_2_gt(pred, last)

    full_in = np.asarray(batch[:, : trainer.input_n])
    full_gt = np.asarray(batch[:, trainer.input_n :])
    all_seq = np.array(full_gt)
    all_seq[:, :, trainer.dim_used] = np.asarray(pred)
    all_seq[:, :, H36M_INDEX_TO_IGNORE_EVAL] = all_seq[:, :, H36M_INDEX_TO_EQUAL_EVAL]
    gt = np.array(full_gt)
    gt[:, :, H36M_INDEX_TO_IGNORE_EVAL] = gt[:, :, H36M_INDEX_TO_EQUAL_EVAL]

    out_dir = os.path.join(log_dir, "visualization")
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(all_seq.shape[0]):
        path = os.path.join(out_dir, f"{action}_{i}.gif")
        visualize_batch(all_seq[i], path, batch_gt=gt[i], batch_train=full_in[i])
        paths.append(path)
    return paths



def _train_and_evaluate(
    args, trainer, state, logger, log_dir,
    dataset, frames, vald, vframes,
    test_frames, test_starts, test_gids, action_names,
    *,
    test_kind: str,
    metric_names: tuple,
    m1_scale: float = 1.0,
    teacher_forcing_epochs=None,
    start_epoch: int = 0,
    batch_order_fn=None,
    epoch_callback=None,
):
    """Shared epoch driver: train -> validate -> grouped per-action test ->
    history/TensorBoard/checkpoint. Used by all grouped-eval runners; AMASS
    (single test corpus, joint-scatter eval) keeps its own small loop.

    metric_names: (m1, m2) labels, e.g. ("mpjpe", "auc_pck").
    m1_scale: applied to the primary test metric (1000 for AIS meters -> mm).
    teacher_forcing_epochs: not None selects the autoregressive trainer path.
    batch_order_fn: epoch -> window permutation, replays an explicit batch
        stream (lockstep parity runs, tools/parity_runs.py). Direct
        trainer path only.
    epoch_callback: ``f(epoch, history)`` called after each epoch's metrics
        land in ``history`` — the study drivers report intermediate values
        and prune through it (sweep/engine.py TrialPruned propagates; the
        epoch's checkpoint is already saved). Forces the per-epoch path
        (pruning needs a host decision every epoch, which is exactly what
        --epochs_per_dispatch amortizes away).
    """
    history = {"train": [], "val": [], "test": [],
               "metrics": {metric_names[0]: [], metric_names[1]: []}}
    autoreg = teacher_forcing_epochs is not None

    epd = int(getattr(args, "epochs_per_dispatch", 1) or 1)
    if epd > 1 and batch_order_fn is not None:
        print(
            ">>> --epochs_per_dispatch ignored: an explicit batch-order "
            "stream (parity run) requires the per-epoch path"
        )
    if epd > 1 and epoch_callback is not None:
        print(
            ">>> --epochs_per_dispatch ignored: per-epoch reporting/pruning "
            "requires the per-epoch path"
        )
    if epd > 1 and batch_order_fn is None and epoch_callback is None:
        return _train_and_evaluate_fused(
            args, trainer, state, logger, log_dir,
            dataset, frames, vald, vframes,
            test_frames, test_starts, test_gids, action_names,
            test_kind=test_kind, metric_names=metric_names,
            m1_scale=m1_scale, teacher_forcing_epochs=teacher_forcing_epochs,
            start_epoch=start_epoch, history=history, epd=epd,
        )

    for epoch in range(start_epoch, args.n_epochs):
        t0 = time.time()
        with profile_trace(profile_dir_from_env() if epoch == 0 else None):
            if autoreg:
                tf = epoch < teacher_forcing_epochs
                state, train_loss = trainer.train_epoch_ar(
                    state, dataset, frames, args.batch_size, seed=epoch,
                    teacher_forcing=tf,
                )
            else:
                state, train_loss = trainer.train_epoch(
                    state, dataset, frames, args.batch_size, seed=epoch,
                    order=batch_order_fn(epoch) if batch_order_fn else None,
                )
        logger.add_scalar(
            "perf/train_seq_per_sec", len(dataset) / max(time.time() - t0, 1e-9), epoch
        )
        val_loss = trainer.validate(state, vald, vframes, args.batch_size)

        m1s, m2s, ns = trainer.evaluate_grouped(
            state, test_frames, test_starts, test_gids,
            len(action_names), args.batch_size_test, test_kind,
        )
        per_action = {
            a: (m1s[i] / ns[i] * m1_scale, m2s[i] / ns[i])
            for i, a in enumerate(action_names)
        }
        m1_avg = m1s.sum() / ns.sum() * m1_scale
        m2_avg = m2s.sum() / ns.sum()

        history["train"].append(train_loss)
        history["val"].append(val_loss)
        history["test"].append(m1_avg)
        history["per_action"] = per_action
        history["metrics"][metric_names[0]].append(m1_avg)
        history["metrics"][metric_names[1]].append(m2_avg)
        logger.add_scalar("loss/train", train_loss, epoch)
        logger.add_scalar("loss/val", val_loss, epoch)
        logger.add_scalar("loss/test", m1_avg, epoch)
        logger.add_scalar(f"metrics/{metric_names[0]}", m1_avg, epoch)
        logger.add_scalar(f"metrics/{metric_names[1]}", m2_avg, epoch)

        save_checkpoint(os.path.join(log_dir, "model.ckpt"), state, epoch,
                        meta=vars(args))
        tf_note = f"tf={epoch < teacher_forcing_epochs} " if autoreg else ""
        print(
            f"epoch {epoch}: {tf_note}train {train_loss:.4f} val {val_loss:.4f} "
            f"test {m1_avg:.4f} ({time.time() - t0:.1f}s)"
        )
        if epoch_callback is not None:
            try:
                epoch_callback(epoch, history)
            except BaseException:
                logger.close()  # flush TB events for the pruned partial run
                raise

    return history, state


def _chunk_epochs(start: int, stop: int, epd: int, tf_boundary=None):
    """Split [start, stop) into chunks of <= epd epochs, never straddling the
    teacher-forcing boundary (the TF flag is static in the fused program).

    Every distinct chunk length K compiles a separate fused program, and on
    the tunneled runtime a remote compile (~20-60 s) can dwarf what fusion
    saves — so per segment: if epd does not divide the length, prefer the
    largest divisor in [ceil(epd/2), epd] (one compiled shape, at most 2x
    the dispatches); otherwise balance the chunk sizes (at most two shapes,
    differing by one) instead of leaving a lopsided remainder chunk.
    """
    cuts = [start, stop]
    if tf_boundary is not None and start < tf_boundary < stop:
        cuts.insert(1, tf_boundary)
    chunks = []
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        length = hi - lo
        if length <= 0:
            continue
        if length % epd == 0:
            sizes = [epd] * (length // epd)
        else:
            div = next(
                (d for d in range(min(epd, length), (epd + 1) // 2 - 1, -1)
                 if length % d == 0),
                None,
            )
            if div is not None:
                sizes = [div] * (length // div)
            else:
                n_chunks = -(-length // epd)
                base, extra = divmod(length, n_chunks)
                sizes = [base + 1] * extra + [base] * (n_chunks - extra)
                print(
                    f">>> epochs_per_dispatch={epd} does not divide "
                    f"{length} epochs: using chunk sizes {base + 1}/{base} "
                    "(two compiled programs)"
                )
        e = lo
        for s in sizes:
            chunks.append(range(e, e + s))
            e += s
    return chunks


def _run_fused_chunks(
    args, trainer, state, epd, *,
    dataset, frames, vald, vframes, test_frames, test_starts, test_gids,
    n_groups, test_kind, batch_size_test, start_epoch, tf_boundary,
    nan_guard, log_epoch, save_chunk,
):
    """Shared ``--epochs_per_dispatch`` chunk loop (used by the grouped-eval
    driver and the AMASS runner): iterate _chunk_epochs, run each chunk as
    ONE XLA dispatch (Trainer.run_epochs_fused), then replay the chunk's
    per-epoch metric arrays through ``log_epoch(epoch, i, out, seq_per_s,
    per_epoch_s, k)`` and checkpoint via ``save_chunk(state, last_epoch)``.

    The first chunk runs under profile_trace (same contract as the default
    path's epoch 0). With ``nan_guard`` (the autoregressive trainer's
    guardrail, autoreg_trainer.py:264-270), a chunk whose train losses go
    non-finite still logs its finite prefix of epochs before raising, so a
    divergence at epoch k of a chunk does not discard the metrics of the
    k-1 good epochs (the last checkpoint is the previous chunk's — the
    intermediate device state of a fused chunk is not observable).
    """
    for ci, chunk in enumerate(
        _chunk_epochs(start_epoch, args.n_epochs, epd, tf_boundary)
    ):
        epochs = list(chunk)
        tf = (epochs[0] < tf_boundary) if tf_boundary is not None else None
        t0 = time.time()
        with profile_trace(profile_dir_from_env() if ci == 0 else None):
            state, out = trainer.run_epochs_fused(
                state, dataset, frames, args.batch_size, epochs,
                vald, vframes, test_frames, test_starts, test_gids,
                n_groups, test_kind, batch_size_test,
                teacher_forcing=tf,
            )
        chunk_s = time.time() - t0
        seq_per_s = len(dataset) * len(epochs) / max(chunk_s, 1e-9)
        finite = np.isfinite(out["train"])
        n_good = len(epochs) if (not nan_guard or np.all(finite)) else int(
            np.argmin(finite)
        )
        for i, epoch in enumerate(epochs[:n_good]):
            log_epoch(epoch, i, out, seq_per_s, chunk_s / len(epochs),
                      len(epochs))
        if n_good < len(epochs):
            raise FloatingPointError(
                f"Loss is nan at epoch {epochs[n_good]} — closed-loop "
                "rollout diverged (try --clip_grad or more teacher-forcing "
                f"epochs); logged {n_good} finite epochs of this chunk, "
                "last checkpoint is the previous chunk's")
        save_chunk(state, epochs[-1])
    return state


def _train_and_evaluate_fused(
    args, trainer, state, logger, log_dir,
    dataset, frames, vald, vframes,
    test_frames, test_starts, test_gids, action_names,
    *, test_kind, metric_names, m1_scale, teacher_forcing_epochs,
    start_epoch, history, epd,
):
    """Epoch driver with ``--epochs_per_dispatch`` > 1: each chunk of K epochs
    (train + val + per-action test) runs as ONE XLA dispatch
    (Trainer.run_epochs_fused) and comes back as per-epoch metric arrays, so
    the TensorBoard/JSONL/stdout history is per-epoch exactly like the
    default path. The observable differences: checkpoints are written once
    per chunk (the reference overwrites model.pt every epoch, so the final
    artifact is identical) and perf/train_seq_per_sec is the chunk-amortized
    rate.
    """
    autoreg = teacher_forcing_epochs is not None

    def log_epoch(epoch, i, out, seq_per_s, per_epoch_s, k):
        train_loss = float(out["train"][i])
        val_loss = float(out["val"][i])
        m1s, m2s, ns = out["m1"][i], out["m2"][i], out["n"][i]
        per_action = {
            a: (m1s[j] / ns[j] * m1_scale, m2s[j] / ns[j])
            for j, a in enumerate(action_names)
        }
        m1_avg = m1s.sum() / ns.sum() * m1_scale
        m2_avg = m2s.sum() / ns.sum()
        history["train"].append(train_loss)
        history["val"].append(val_loss)
        history["test"].append(m1_avg)
        history["per_action"] = per_action
        history["metrics"][metric_names[0]].append(m1_avg)
        history["metrics"][metric_names[1]].append(m2_avg)
        logger.add_scalar("perf/train_seq_per_sec", seq_per_s, epoch)
        logger.add_scalar("loss/train", train_loss, epoch)
        logger.add_scalar("loss/val", val_loss, epoch)
        logger.add_scalar("loss/test", m1_avg, epoch)
        logger.add_scalar(f"metrics/{metric_names[0]}", m1_avg, epoch)
        logger.add_scalar(f"metrics/{metric_names[1]}", m2_avg, epoch)
        tf_note = f"tf={epoch < teacher_forcing_epochs} " if autoreg else ""
        print(
            f"epoch {epoch}: {tf_note}train {train_loss:.4f} "
            f"val {val_loss:.4f} test {m1_avg:.4f} "
            f"({per_epoch_s:.1f}s, fused x{k})"
        )

    def save_chunk(chunk_state, last_epoch):
        save_checkpoint(os.path.join(log_dir, "model.ckpt"), chunk_state,
                        last_epoch, meta=vars(args))

    state = _run_fused_chunks(
        args, trainer, state, epd,
        dataset=dataset, frames=frames, vald=vald, vframes=vframes,
        test_frames=test_frames, test_starts=test_starts,
        test_gids=test_gids, n_groups=len(action_names),
        test_kind=test_kind, batch_size_test=args.batch_size_test,
        start_epoch=start_epoch,
        tf_boundary=teacher_forcing_epochs if autoreg else None,
        nan_guard=autoreg, log_epoch=log_epoch, save_chunk=save_chunk,
    )
    return history, state


def _h36m_metric_names(loss_type):
    return ("mpjpe", "auc_pck") if loss_type == "mpjpe" else ("euler_angle", "joint_angle")

def run_h36m(args, model=None, model_name: Optional[str] = None,
             init_variables=None, batch_order_fn=None, epoch_callback=None):
    """H36M direct training (train_mixer_h36m.py:47-279 + per-epoch tests)."""
    mode = "xyz" if args.loss_type == "mpjpe" else "angle"
    dim_used = H36M_DIM_USED_XYZ if mode == "xyz" else H36M_DIM_USED_ANGLE

    dataset = H36MDataset(args.data_dir, args.input_n, args.output_n,
                          args.skip_rate, split=0, mode=mode)
    vald = H36MDataset(args.data_dir, args.input_n, args.output_n,
                       args.skip_rate, split=1, mode=mode)
    actions = define_actions(args.actions_to_consider)
    test_sets = {
        a: H36MDataset(args.data_dir, args.input_n, args.output_n,
                       args.skip_rate, actions=[a], split=2, mode=mode)
        for a in actions
    }
    print(f">>> Training dataset length: {len(dataset)}")
    print(f">>> Validation dataset length: {len(vald)}")

    if model is None:
        model = build_conv_mixer(
            args, len(dim_used), len(dim_used), args.input_n, args.output_n
        )
    model_name = model_name or f"h36_3d_{args.output_n}frames_ckpt"
    log_dir = _log_dir(args, model_name)
    logger = MetricLogger(log_dir)

    opt = make_optimizer(
        lr=args.lr, weight_decay=1e-5, use_scheduler=args.use_scheduler,
        milestones=args.milestones, gamma=args.gamma,
        steps_per_epoch=_steps_per_epoch(len(dataset), args.batch_size),
        clip_grad=args.clip_grad,
    )
    trainer = Trainer(
        model, opt, loss_type=args.loss_type, dim_used=dim_used,
        input_n=args.input_n, output_n=args.output_n,
        input_scale=1e-3 if args.loss_type == "mpjpe" else 1.0,
        delta_x=getattr(args, "delta_x", False),
    )
    state = trainer.init_state(jax.random.PRNGKey(getattr(args, "seed", 0)))
    state = _apply_init_variables(trainer, state, init_variables)
    print(f"total number of parameters of the network is: {param_count(state)}")

    start_epoch = 0
    resume_path = getattr(args, "resume", None)
    if resume_path:
        # real resume (the reference's --load_checkpoint flag is dead,
        # train_mixer_h36m.py:514): restores params + optimizer + epoch + rng.
        from ..train import restore_checkpoint

        state, last_epoch = restore_checkpoint(resume_path, state)
        start_epoch = last_epoch + 1
        print(f"resumed from {resume_path} at epoch {start_epoch}")

    frames = jnp.asarray(dataset.frames)
    vframes = jnp.asarray(vald.frames)
    test_frames, test_starts, test_gids, action_names = _combine_test_sets(test_sets)

    history, state = _train_and_evaluate(
        args, trainer, state, logger, log_dir,
        dataset, frames, vald, vframes,
        test_frames, test_starts, test_gids, action_names,
        test_kind="h36m_xyz" if args.loss_type == "mpjpe" else "h36m_angle",
        metric_names=_h36m_metric_names(args.loss_type),
        start_epoch=start_epoch,
        batch_order_fn=batch_order_fn,
        epoch_callback=epoch_callback,
    )

    if getattr(args, "visualize", False) and args.loss_type == "mpjpe":
        first_action = action_names[0]
        paths = export_h36m_visualizations(
            trainer, state, test_sets[first_action], log_dir, first_action
        )
        print(f"wrote {len(paths)} visualization GIFs to {log_dir}/visualization")

    logger.close()
    return history, state, trainer


def run_h36m_autoregressive(args, model=None, model_name: Optional[str] = None,
                            init_variables=None, epoch_callback=None):
    """Autoregressive H36M training (train_autoreg_mixer_h36m.py:49-192)."""
    mode = "xyz" if args.loss_type == "mpjpe" else "angle"
    dim_used = H36M_DIM_USED_XYZ if mode == "xyz" else H36M_DIM_USED_ANGLE

    dataset = H36MDataset(args.data_dir, args.input_n_dataset, args.output_n_dataset,
                          args.skip_rate, split=0, mode=mode)
    vald = H36MDataset(args.data_dir, args.input_n_dataset, args.output_n_dataset,
                       args.skip_rate, split=1, mode=mode)
    actions = define_actions(args.actions_to_consider)
    test_sets = {
        a: H36MDataset(args.data_dir, args.input_n_dataset, args.output_n_dataset,
                       args.skip_rate, actions=[a], split=2, mode=mode)
        for a in actions
    }

    if model is None:
        model = build_conv_mixer(
            args, len(dim_used), len(dim_used),
            args.input_n_model, args.output_n_model,
        )
    model_name = model_name or f"h36_ar_{args.output_n_dataset}frames_ckpt"
    log_dir = _log_dir(args, model_name)
    logger = MetricLogger(log_dir)

    opt = make_optimizer(
        lr=args.lr, weight_decay=1e-5, use_scheduler=args.use_scheduler,
        milestones=args.milestones, gamma=args.gamma,
        steps_per_epoch=_steps_per_epoch(len(dataset), args.batch_size),
        clip_grad=args.clip_grad,
    )
    trainer = AutoregressiveTrainer(
        model, opt, loss_type=args.loss_type, dim_used=dim_used,
        input_n=args.input_n_dataset, output_n=args.output_n_dataset,
        input_n_model=args.input_n_model, output_n_model=args.output_n_model,
        step_window=args.step_window,
    )
    state = trainer.init_state(jax.random.PRNGKey(getattr(args, "seed", 0)))
    state = _apply_init_variables(trainer, state, init_variables)
    print(f"total number of parameters of the network is: {param_count(state)}")

    frames = jnp.asarray(dataset.frames)
    vframes = jnp.asarray(vald.frames)
    test_frames, test_starts, test_gids, action_names = _combine_test_sets(test_sets)

    history, state = _train_and_evaluate(
        args, trainer, state, logger, log_dir,
        dataset, frames, vald, vframes,
        test_frames, test_starts, test_gids, action_names,
        test_kind="ar",
        metric_names=_h36m_metric_names(args.loss_type),
        teacher_forcing_epochs=args.n_epochs_teacher_forcing,
        epoch_callback=epoch_callback,
    )

    logger.close()
    return history, state, trainer


def run_ais(args, model=None, model_name: Optional[str] = None,
            epoch_callback=None):
    """AIS direct training (train_mixer_ais.py:47-292)."""
    dim_used = AIS_DIM_USED
    common = dict(
        input_n=args.input_n, output_n=args.output_n, skip_rate=args.skip_rate,
        smoothing_alpha=getattr(args, "smoothing_alpha", 0.15),
        canonicalize=getattr(args, "canonicalize", True),
    )
    dataset = AISDataset(args.data_dir, actions=AIS_TRAIN_ACTIONS, **common)
    vald = AISDataset(args.data_dir, actions=AIS_VAL_ACTIONS, **common)
    test_sets = {
        a: AISDataset(args.data_dir, actions=[a], **common)
        for a in AIS_TEST_ACTIONS
    }

    if model is None:
        model = build_conv_mixer(
            args, len(dim_used), len(dim_used), args.input_n, args.output_n
        )
    model_name = model_name or f"ais_3d_{args.output_n}frames_ckpt"
    log_dir = _log_dir(args, model_name)
    logger = MetricLogger(log_dir)

    opt = make_optimizer(
        lr=args.lr, weight_decay=1e-5, use_scheduler=args.use_scheduler,
        milestones=args.milestones, gamma=args.gamma,
        steps_per_epoch=_steps_per_epoch(len(dataset), args.batch_size),
        clip_grad=args.clip_grad,
    )
    # AIS data is in meters; no input scaling, test loss reported x1000 mm
    # (train_mixer_ais.py:193,386-388).
    trainer = Trainer(
        model, opt, loss_type=args.loss_type, dim_used=dim_used,
        input_n=args.input_n, output_n=args.output_n,
        input_scale=1.0, loss_scale=1.0,
    )
    state = trainer.init_state(jax.random.PRNGKey(getattr(args, "seed", 0)))
    print(f"total number of parameters of the network is: {param_count(state)}")

    frames = jnp.asarray(dataset.frames)
    vframes = jnp.asarray(vald.frames)
    test_frames, test_starts, test_gids, action_names = _combine_test_sets(test_sets)

    # test metric in mm (train_mixer_ais.py:386-388)
    history, state = _train_and_evaluate(
        args, trainer, state, logger, log_dir,
        dataset, frames, vald, vframes,
        test_frames, test_starts, test_gids, action_names,
        test_kind="simple",
        metric_names=("mpjpe", "auc_pck"),
        m1_scale=1000.0,
        epoch_callback=epoch_callback,
    )

    logger.close()
    return history, state, trainer


def run_ais_autoregressive(args, model=None, model_name: Optional[str] = None,
                           epoch_callback=None):
    """AIS autoregressive training (train_autoreg_mixer_ais.py:63-203).

    Test metric: 1000x rollout loss (mm) + AUC-PCK on raw meters
    (train_autoreg_mixer_ais.py:266-268,298-300 — note the /1000 is
    commented out there).
    """
    dim_used = AIS_DIM_USED
    common = dict(
        input_n=args.input_n_dataset, output_n=args.output_n_dataset,
        skip_rate=args.skip_rate,
        smoothing_alpha=getattr(args, "smoothing_alpha", 0.15),
        canonicalize=getattr(args, "canonicalize", True),
    )
    dataset = AISDataset(args.data_dir, actions=AIS_TRAIN_ACTIONS, **common)
    vald = AISDataset(args.data_dir, actions=AIS_VAL_ACTIONS, **common)
    test_sets = {
        a: AISDataset(args.data_dir, actions=[a], **common)
        for a in AIS_TEST_ACTIONS
    }

    if model is None:
        model = build_conv_mixer(
            args, len(dim_used), len(dim_used),
            args.input_n_model, args.output_n_model,
        )
    model_name = model_name or f"ais_ar_{args.output_n_dataset}frames_ckpt"
    log_dir = _log_dir(args, model_name)
    logger = MetricLogger(log_dir)

    opt = make_optimizer(
        lr=args.lr, weight_decay=1e-5, use_scheduler=args.use_scheduler,
        milestones=args.milestones, gamma=args.gamma,
        steps_per_epoch=_steps_per_epoch(len(dataset), args.batch_size),
        clip_grad=args.clip_grad,
    )
    trainer = AutoregressiveTrainer(
        model, opt, loss_type="mpjpe", dim_used=dim_used,
        input_n=args.input_n_dataset, output_n=args.output_n_dataset,
        input_n_model=args.input_n_model, output_n_model=args.output_n_model,
        step_window=args.step_window,
        auc_scale=1.0,  # AIS AUC on raw meters (train_autoreg_mixer_ais.py:266-268)
    )
    state = trainer.init_state(jax.random.PRNGKey(getattr(args, "seed", 0)))
    print(f"total number of parameters of the network is: {param_count(state)}")

    frames = jnp.asarray(dataset.frames)
    vframes = jnp.asarray(vald.frames)
    test_frames, test_starts, test_gids, action_names = _combine_test_sets(test_sets)

    # rollout test metric x1000 mm (train_autoreg_mixer_ais.py:298-300)
    history, state = _train_and_evaluate(
        args, trainer, state, logger, log_dir,
        dataset, frames, vald, vframes,
        test_frames, test_starts, test_gids, action_names,
        test_kind="ar",
        metric_names=("mpjpe", "auc_pck"),
        m1_scale=1000.0,
        teacher_forcing_epochs=args.n_epochs_teacher_forcing,
        epoch_callback=epoch_callback,
    )

    logger.close()
    return history, state, trainer


def run_amass(args, model=None, model_name: Optional[str] = None,
              init_variables=None):
    """AMASS training (amass/train_mixer_amass.py:34-148,153-199).

    The reference's test_mpjpe divides by a never-incremented ``n_batches``
    (returns inf; train_mixer_amass.py:158,199) — fixed here by dividing by
    the sample count, which is what the printed value uses.
    """
    dim_used = AMASS_DIM_USED
    dataset = AMASSDataset(args.data_dir, args.input_n, args.output_n,
                           args.skip_rate, split=0)
    vald = AMASSDataset(args.data_dir, args.input_n, args.output_n,
                        args.skip_rate, split=1)
    test = AMASSDataset(args.data_dir, args.input_n, args.output_n,
                        args.skip_rate, split=2)

    if model is None:
        model = build_mlp_mixer(args, len(dim_used), args.input_n, args.output_n)
    model_name = model_name or f"amass_3d_{args.output_n}frames_ckpt"
    log_dir = _log_dir(args, model_name)
    logger = MetricLogger(log_dir)

    opt = make_optimizer(
        lr=args.lr, weight_decay=1e-5, use_scheduler=args.use_scheduler,
        milestones=args.milestones, gamma=args.gamma,
        steps_per_epoch=_steps_per_epoch(len(dataset), args.batch_size),
        clip_grad=args.clip_grad,
    )
    # AMASS joints are in meters; loss reported x1000 (train_mixer_amass.py:92)
    trainer = Trainer(
        model, opt, loss_type="mpjpe", dim_used=dim_used,
        input_n=args.input_n, output_n=args.output_n,
        input_scale=1.0, loss_scale=1000.0,
    )
    state = trainer.init_state(jax.random.PRNGKey(getattr(args, "seed", 0)))
    state = _apply_init_variables(trainer, state, init_variables)
    print(f"total number of parameters of the network is: {param_count(state)}")

    frames = jnp.asarray(dataset.frames)
    vframes = jnp.asarray(vald.frames)
    tframes = jnp.asarray(test.frames)

    amass_test = make_amass_test_fn(trainer)
    history = {"train": [], "val": [], "test": []}

    epd = int(getattr(args, "epochs_per_dispatch", 1) or 1)
    if epd > 1:
        # fused multi-epoch dispatch (shared chunk loop); the "amass22" eval
        # kind was registered by make_amass_test_fn above.
        def log_epoch(epoch, i, out, seq_per_s, per_epoch_s, k):
            train_loss = float(out["train"][i])
            val_loss = float(out["val"][i])
            test_loss = float(out["m1"][i][0] / max(out["n"][i][0], 1.0))
            history["train"].append(train_loss)
            history["val"].append(val_loss)
            history["test"].append(test_loss)
            logger.add_scalar("perf/train_seq_per_sec", seq_per_s, epoch)
            logger.add_scalar("loss/train", train_loss, epoch)
            logger.add_scalar("loss/val", val_loss, epoch)
            logger.add_scalar("loss/test", test_loss, epoch)
            print(
                f"epoch {epoch}: train {train_loss:.3f} val {val_loss:.3f} "
                f"test {test_loss:.3f}mm ({per_epoch_s:.1f}s, fused x{k})"
            )

        def save_chunk(chunk_state, last_epoch):
            save_checkpoint(os.path.join(log_dir, "model.ckpt"), chunk_state,
                            last_epoch, meta=vars(args))
            if getattr(args, "model_path", None):
                save_checkpoint(args.model_path, chunk_state, last_epoch,
                                meta=vars(args))

        state = _run_fused_chunks(
            args, trainer, state, epd,
            dataset=dataset, frames=frames, vald=vald, vframes=vframes,
            test_frames=tframes, test_starts=test.window_starts,
            test_gids=np.zeros(len(test), np.int64), n_groups=1,
            test_kind="amass22", batch_size_test=args.batch_size,
            start_epoch=0, tf_boundary=None, nan_guard=False,
            log_epoch=log_epoch, save_chunk=save_chunk,
        )
        logger.close()
        return history, state, trainer

    for epoch in range(args.n_epochs):
        t0 = time.time()
        with profile_trace(profile_dir_from_env() if epoch == 0 else None):
            state, train_loss = trainer.train_epoch(
                state, dataset, frames, args.batch_size, seed=epoch
            )
        logger.add_scalar(
            "perf/train_seq_per_sec", len(dataset) / max(time.time() - t0, 1e-9), epoch
        )
        val_loss = trainer.validate(state, vald, vframes, args.batch_size)
        test_loss = amass_test(state, test, tframes, args.batch_size)
        history["train"].append(train_loss)
        history["val"].append(val_loss)
        history["test"].append(test_loss)
        logger.add_scalar("loss/train", train_loss, epoch)
        logger.add_scalar("loss/val", val_loss, epoch)
        logger.add_scalar("loss/test", test_loss, epoch)
        save_checkpoint(os.path.join(log_dir, "model.ckpt"), state, epoch,
                        meta=vars(args))
        if getattr(args, "model_path", None):
            save_checkpoint(args.model_path, state, epoch, meta=vars(args))
        print(
            f"epoch {epoch}: train {train_loss:.3f} val {val_loss:.3f} "
            f"test {test_loss:.3f}mm ({time.time() - t0:.1f}s)"
        )

    logger.close()
    return history, state, trainer


def make_amass_test_fn(trainer):
    """22-joint scatter eval (train_mixer_amass.py:153-199): the 18 predicted
    joints are inserted back into the 22-joint gt skeleton; MPJPE x1000.

    Returns fn(state, corpus, frames, batch_size) -> float. Build once per
    run so the jitted step is compiled once.
    """
    from ..data.windows import gather_windows
    from ..train.loop import _per_sample_mpjpe

    seq_len = trainer.input_n + trainer.output_n
    dim_used = jnp.asarray(trainer.dim_used)

    def per_sample(variables, frames, starts):
        batch = gather_windows(frames, starts, seq_len)
        seq = jnp.take(batch, dim_used, axis=2)
        model_in = seq[:, : trainer.input_n]
        pred = trainer.model.apply(variables, model_in, training=False)
        gt22 = batch[:, trainer.input_n :, : 22 * 3]
        all_seq = gt22.at[:, :, dim_used].set(pred)
        per = _per_sample_mpjpe(all_seq, gt22) * 1000.0
        return per, per

    trainer.register_eval_kind("amass22", per_sample)

    def run(state, corpus, frames, batch_size: int) -> float:
        # one scanned dispatch per epoch test, like train/val
        return trainer.evaluate(state, corpus, frames, batch_size, kind="amass22")[0]

    return run
