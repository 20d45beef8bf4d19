"""Scalar/metric logging: TensorBoard events + JSONL fallback.

Parity target: tensorboardX SummaryWriter usage at
interfaces/super_resolution.py:96-103 (event dir ``tensorboard/<vis_dir>``,
cleared on start) and the scalar tags ``loss/{distill,SR,SSIM,total}`` and
``eval/<metric>_<split>`` (:395-404,425-428,486-490).

Uses torch.utils.tensorboard when available (torch is CPU-only here — the
writer never touches the accelerator); always also writes ``scalars.jsonl``
so logs are greppable without TensorBoard.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional


class ScalarLogger:
    def __init__(self, log_dir: str, clear: bool = True):
        # Multi-host: every process runs the train loop on identical
        # replicated metrics; only process 0 writes event files.
        from tpgsr_tpu.train.checkpoint import is_primary_host

        self._jsonl = None
        self._tb = None
        if not is_primary_host():
            return
        if clear and os.path.isdir(log_dir):
            shutil.rmtree(log_dir)  # super_resolution.py:98-101
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, global_step: int) -> None:
        if self._jsonl is None:
            return
        self._jsonl.write(
            json.dumps({"t": time.time(), "tag": tag, "value": float(value), "step": int(global_step)})
            + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), global_step=global_step)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
