#!/usr/bin/env python3
"""Dispatch-chain (k) sensitivity of end-to-end training throughput.

With the host loader off the critical path (transformed-array cache,
docs/perf_notes.md), the remaining e2e-vs-step-only gap is per-chunk
overhead: the np.stack of k collated batches, one host->device transfer,
one dispatch, and the device-sync readback.  All of these amortize with k,
so this sweeps TRAIN.dispatch_chain and reports img/s per k.  Each k runs
chunks = max(2, round(total/k)) chunks (so chunks*k tracks the ~200-step
budget for any k, and every k gets >=2 timed chunks); the actual step count
chunks*k is printed alongside img/s so cross-k comparisons stay honest.

Run on the real TPU.  If a larger k beats the YAML's 25 by >=5%, ship it as
the default (val/save boundaries still split chains exactly — trajectory
equality is chain-size-independent, test_trainer_e2e).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [25, 50, 100]
    total_steps = 200  # same timed work for every k
    out = {}
    for k in ks:
        chunks = max(2, round(total_steps / k))
        ips = bench._bench_train_e2e(chunks=chunks, k_override=k)
        out[k] = round(ips, 1)
        print(f"k={k:4d} chunks={chunks:3d} steps={chunks * k:4d}"
              f"  {ips:8.1f} img/s", flush=True)
    print(json.dumps({"train_e2e_ips_by_dispatch_chain": out}))


if __name__ == "__main__":
    main()
