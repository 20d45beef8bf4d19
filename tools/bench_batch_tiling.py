#!/usr/bin/env python3
"""Measure flagship inference at large batch with lax.map over batch tiles.

At batch 512 XLA's conv emitter flips to batch-in-lanes layouts
(EmitOutputBatchInLanesKernelOutputFeatureInLanes), which makes every
GRU-adjacent reshape a physical relayout copy and roughly doubles per-image
cost vs batch 48 (docs/perf_notes.md).  This experiment keeps the large
user-facing batch but runs the forward per batch-tile inside one dispatch,
so each tile compiles at the small-batch program XLA handles well.

Usage: python tools/bench_batch_tiling.py [batch] [tile ...]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench
    from __graft_entry__ import _flagship

    nums = [int(a) for a in sys.argv[1:] if a.isdigit()]
    batch = nums[0] if nums else 512
    tiles = nums[1:] or [64, 128]

    forward, sr_vars, stu_vars, lr_img = _flagship(batch=batch)
    lr = jax.device_put(
        np.random.default_rng(0).random(lr_img.shape).astype(np.float32))

    def tiled(tile):
        def f(sv, tv, x):
            xt = x.reshape(batch // tile, tile, *x.shape[1:])
            yt = jax.lax.map(lambda xx: forward(sv, tv, xx), xt)
            return yt.reshape(batch, *yt.shape[2:])

        return f

    def scan_tiled(tile, unroll):
        """lax.scan over tiles with ``unroll`` bodies per iteration — lets
        XLA interleave/pipeline adjacent tiles' ops inside one loop step
        (attacking the serial tile chain's residual, VERDICT r3 item 7)."""

        def f(sv, tv, x):
            xt = x.reshape(batch // tile, tile, *x.shape[1:])
            _, yt = jax.lax.scan(
                lambda c, xx: (c, forward(sv, tv, xx)), None, xt, unroll=unroll)
            return yt.reshape(batch, *yt.shape[2:])

        return f

    def py_unrolled(tile):
        """Full unroll: straight-line tile programs, no loop machinery at
        all — upper bound on what pipelining can recover (compile ~n_tiles x
        slower)."""

        def f(sv, tv, x):
            xt = x.reshape(batch // tile, tile, *x.shape[1:])
            ys = [forward(sv, tv, xt[i]) for i in range(batch // tile)]
            return jnp.concatenate(ys, axis=0)

        return f

    def measure(fwd, n2, trials=3, label=""):
        f1 = bench._chained(fwd, 1)
        f2 = bench._chained(fwd, n2)
        args = (sr_vars, stu_vars, lr)
        float(np.asarray(f1(*args)))
        float(np.asarray(f2(*args)))
        per = bench._median_diff(f1, f2, args, 1, n2, trials)
        print(f"{label}: {batch / per:9.1f} img/s  ({per * 1e3:.2f} ms/fwd)")
        return batch / per

    if "--flat" in sys.argv:
        measure(forward, 9, label=f"batch {batch} flat     ")
    for tile in tiles:
        if batch % tile:
            print(f"tile {tile}: skipped (does not divide {batch})")
            continue
        measure(tiled(tile), 9, label=f"batch {batch} tile {tile:4d}")
        if "--unroll" in sys.argv:
            for u in (2, 4):
                if batch // tile >= u:
                    measure(scan_tiled(tile, u), 9,
                            label=f"batch {batch} tile {tile:4d} scanU{u}")
        if "--py-unroll" in sys.argv:
            measure(py_unrolled(tile), 9,
                    label=f"batch {batch} tile {tile:4d} fullunroll")


if __name__ == "__main__":
    main()
