#!/usr/bin/env python3
"""Host-side input-pipeline microbenchmark (no TPU): synthetic-LMDB ->
TextZoomDataset(cache_images) -> canonical train collate (realWTLAMask,
uint8 wire) -> DataLoader, timed per epoch.

Quantifies the loader term of the end-to-end training rate
(docs/perf_notes.md "Host input pipeline"); run after any collate/dataset
change.  Also prints a per-phase breakdown (dataset fetch vs collate) from
a direct single-thread loop, which the threaded DataLoader numbers should
roughly match on this 1-core box.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=960, help="dataset size")
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--no-collate-cache", action="store_true")
    args = p.parse_args()

    from tests.fixtures import make_textzoom_lmdb
    from tpgsr_tpu.data.collate import COLLATES, CollateConfig
    from tpgsr_tpu.data.datasets import TextZoomDataset
    from tpgsr_tpu.data.loader import DataLoader

    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    try:
        make_textzoom_lmdb(tmp, n=args.n, seed=0)
        ds = TextZoomDataset(tmp, voc_type="all", max_len=100, cache_images=True)
        cfg = CollateConfig(
            imgH=32, imgW=128, down_sample_scale=2, mask=True, train=True,
            wire_dtype="uint8",
            cache_transformed=not args.no_collate_cache,
        )
        collate = lambda items: COLLATES["realWTLAMask"](items, cfg=cfg)
        dl = DataLoader(ds, args.batch, collate, shuffle=True, drop_last=True, seed=1)

        nb = len(dl)
        for e in range(args.epochs):
            t0 = time.perf_counter()
            for _ in dl:
                pass
            dt = time.perf_counter() - t0
            print(f"epoch {e + 1}: {nb * args.batch / dt:8.1f} img/s  ({dt * 1e3:.0f} ms)")

        # phase breakdown, single thread, steady state (everything cached)
        idx = list(range(args.batch))
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            items = [ds[j] for j in idx]
        t_fetch = (time.perf_counter() - t0) / reps
        t0 = time.perf_counter()
        for _ in range(reps):
            collate(items)
        t_coll = (time.perf_counter() - t0) / reps
        print(
            f"steady-state per batch of {args.batch}: fetch {t_fetch * 1e3:.2f} ms, "
            f"collate {t_coll * 1e3:.2f} ms -> "
            f"{args.batch / (t_fetch + t_coll):8.1f} img/s single-thread"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
