#!/usr/bin/env python3
"""Experiment: remat the GRU sweeps in the train step.

Hypothesis: in training, each GRU scan *saves residuals* (fwd sweeps 167 us
vs ~60 us in eval) and the backward re-reads the stacked [T,...] residual
arrays through relayout copies.  ``jax.checkpoint(policy=nothing_saveable)``
on the sweep makes the backward recompute the cell instead — trading cheap
(latency-floor) recompute for the residual HBM traffic + copies.

Variants:
  baseline      current code
  gru_remat     bigru_fused/bilstm_fused/bigru_nhwc_vertical wrapped in remat

Usage: python tools/bench_gru_remat.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np


def _train_ips() -> float:
    import bench

    return bench._bench_train()


def main() -> None:
    import jax

    import tpgsr_tpu.models.layers as layers
    import tpgsr_tpu.ops.rnn as rnn

    base = _train_ips()
    print(f"baseline      train img/s: {base:8.1f}", flush=True)

    policy = jax.checkpoint_policies.nothing_saveable
    for name in ("bigru_fused", "bilstm_fused", "bigru_nhwc_vertical"):
        wrapped = jax.checkpoint(getattr(rnn, name), policy=policy)
        setattr(rnn, name, wrapped)
        setattr(layers, name, wrapped)

    remat = _train_ips()
    print(f"gru_remat     train img/s: {remat:8.1f}  ({(remat/base-1)*100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
