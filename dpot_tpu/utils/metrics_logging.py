"""Structured metric logging: JSONL always, TensorBoard when available.

Scalar names match the reference's SummaryWriter tags
(train_temporal.py:161-168,235-237,282-284: train_loss_step,
train_loss_full, test_loss_step_{path}, test_loss_full_{path}) so curves
are directly comparable.
"""

from __future__ import annotations

import json
import math
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
        v = float(value)
        if self._jsonl:
            # strict JSON: NaN/Inf would serialize as bare NaN/Infinity
            # tokens, breaking every non-Python consumer of the whole
            # file exactly when a diverging run needs its curve read
            rec = {"t": time.time(), "tag": tag,
                   "value": v if math.isfinite(v) else None,
                   "step": int(step)}
            if not math.isfinite(v):
                rec["nonfinite"] = repr(v)
            self._jsonl.write(json.dumps(rec) + "\n")
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
