"""Metric logging: TensorBoard when available, JSONL always.

Mirrors the reference's SummaryWriter usage (reference:
edge_diffusion_tts/train.py:108, 176-192; train_v2.py:267, 320-329): losses
and VQ perplexity/used-codes every step, validation metrics and LR on eval.
The JSONL stream (``metrics.jsonl`` in the run dir) is the canonical record;
TensorBoard is a best-effort mirror.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricWriter:
    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=os.path.join(run_dir, "tb"))
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Dict, prefix: str = ""):
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            key = f"{prefix}{k}"
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                continue
            if self._tb is not None:
                self._tb.add_scalar(key, rec[key], int(step))
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
