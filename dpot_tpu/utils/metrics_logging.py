"""Structured metric logging: JSONL always, TensorBoard when available.

Scalar names match the reference's SummaryWriter tags
(train_temporal.py:161-168,235-237,282-284: train_loss_step,
train_loss_full, test_loss_step_{path}, test_loss_full_{path}) so curves
are directly comparable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricWriter:
    def __init__(self, log_dir: Optional[str], use_tensorboard: bool = True):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(
                os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1
            )
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir=log_dir)
                except Exception:
                    self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        if self._jsonl:
            self._jsonl.write(
                json.dumps(
                    {"t": time.time(), "tag": tag, "value": float(value),
                     "step": int(step)}
                )
                + "\n"
            )
        if self._tb:
            self._tb.add_scalar(tag, float(value), int(step))

    def text(self, msg: str):
        print(msg, flush=True)
        if self.log_dir:
            with open(os.path.join(self.log_dir, "logs.txt"), "a") as f:
                f.write(msg + "\n")

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
