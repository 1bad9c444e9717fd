"""Train state pytree and checkpointing.

Unlike the reference — which saves only ``model.state_dict()`` per epoch and
cannot actually resume (SURVEY.md §5: the ``--load_checkpoint`` flag is never
read) — the checkpoint here is the full ``{params, batch_stats, opt_state,
epoch, rng}`` pytree, so mid-training resume is exact.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
from flax import serialization, struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any  # {} when the model has no BatchNorm
    opt_state: Any
    rng: jax.Array

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def save_checkpoint(path: str, state: TrainState, epoch: int,
                    meta: dict | None = None) -> None:
    """Serialize the full train state (msgpack for arrays + meta pickle).

    The model variables ({params, batch_stats}) are additionally stored as a
    separate msgpack blob so evaluation-only consumers can load weights
    without reconstructing the optimizer (see ``load_variables``).

    ``meta`` (typically ``vars(args)`` of the training CLI) is stored
    alongside so post-hoc consumers (viz.galleries, mmc-test-*) can rebuild
    the exact model architecture instead of guessing CLI defaults.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_state = jax.device_get(state)
    payload = {
        "state": serialization.to_bytes(host_state),
        "variables": serialization.to_bytes(
            {"params": host_state.params, "batch_stats": host_state.batch_stats}
        ),
        "epoch": epoch,
    }
    if meta is not None:
        payload["meta"] = dict(meta)
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    # drop the read cache: a same-size rewrite within the filesystem's
    # mtime granularity would otherwise collide with the old cache key and
    # serve the PREVIOUS epoch's payload to an in-process save->load cycle
    # (e.g. a per-epoch drift callback reading the ckpt it just wrote)
    global _payload_cache
    _payload_cache = None


_payload_cache: tuple | None = None  # ((abspath, mtime_ns, size), payload)


def _read_payload(path: str) -> dict:
    """One-entry read cache: meta-aware consumers (eval CLIs, galleries,
    live viewer) read the meta and then the variables of the SAME file —
    without this, every eval invocation unpickles the full multi-MB
    checkpoint twice. Keyed on (path, mtime, size) so a rewritten
    checkpoint is never served stale."""
    global _payload_cache
    st = os.stat(path)
    key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    if _payload_cache is not None and _payload_cache[0] == key:
        return _payload_cache[1]
    with open(path, "rb") as f:
        payload = pickle.load(f)
    _payload_cache = (key, payload)
    return payload


def restore_checkpoint(path: str, template: TrainState) -> tuple[TrainState, int]:
    """Restore into a template state (built with the same model/optimizer)."""
    payload = _read_payload(path)
    state = serialization.from_bytes(template, payload["state"])
    return state, int(payload["epoch"])


def load_checkpoint_meta(path: str) -> dict | None:
    """The training-args dict stored by ``save_checkpoint`` (None if the
    checkpoint predates meta support or is a converted reference .pt)."""
    meta = _read_payload(path).get("meta")
    return dict(meta) if meta is not None else None


def load_variables(path: str, template_variables: dict) -> dict:
    """Load only the model variables from a checkpoint (eval-time use).

    ``template_variables`` is a ``model.init(...)`` result providing the
    pytree structure; returns {'params': ..., 'batch_stats': ...} with
    batch_stats omitted when empty.
    """
    payload = _read_payload(path)
    template = {
        "params": template_variables["params"],
        "batch_stats": template_variables.get("batch_stats", {}),
    }
    restored = serialization.from_bytes(template, payload["variables"])
    out = {"params": restored["params"]}
    if restored["batch_stats"]:
        out["batch_stats"] = restored["batch_stats"]
    return out
