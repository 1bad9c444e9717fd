"""Metric logging: TensorBoard event files + JSONL, torch-free.

Replaces the reference's ``torch.utils.tensorboard.SummaryWriter``
(train_mixer_h36m.py:57,265-274) with the pure-python tensorboard event
writer, plus an always-on ``metrics.jsonl`` so runs are machine-readable
without TensorBoard.
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    """add_scalar-compatible logger writing TB events and JSONL."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from tensorboard.summary.writer.event_file_writer import (
                EventFileWriter,
            )

            self._tb = EventFileWriter(log_dir)
        except Exception:  # tensorboard not installed — JSONL only
            self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        value = float(value)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": value, "step": int(step), "t": time.time()})
            + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            from tensorboard.compat.proto.event_pb2 import Event
            from tensorboard.compat.proto.summary_pb2 import Summary

            summary = Summary(value=[Summary.Value(tag=tag, simple_value=value)])
            event = Event(summary=summary, step=int(step), wall_time=time.time())
            self._tb.add_event(event)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
