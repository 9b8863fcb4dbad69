"""Metrics logging: JSONL always; TensorBoard when torch is importable.

Replaces the reference's TF1 FileWriter logger (``lib/utils/logger.py:12-70``)
with a dependency-light writer. Scalar tags mirror the reference
(total_loss, rpn_* per level, cross_entropy, loss_box, loss_mask, AP_ROI,
mAP_CLASSIFICATION, mAP_MASK — trainval.py:387-431, 613-632).
"""

from __future__ import annotations

import json
import os
import time


class Logger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def scalar_summary(self, tag: str, value, step: int):
        self._jsonl.write(
            json.dumps(
                {"ts": time.time(), "step": int(step), tag: float(value)}
            )
            + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
