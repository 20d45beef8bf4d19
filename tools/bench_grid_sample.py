#!/usr/bin/env python3
"""Microbench: gather vs contraction grid_sample on the real TPU.

STN shape in the flagship train step: x [48,16,64,4], grid [48,16,64,2]
(stn.py:193 — TPS-rectified input, tps_outputsize == input size).  Also the
MORAN shape [B,32,100,1] for the record.  Forward and fwd+bwd (grad wrt x
and grid, the train-step pattern), chained-length differencing (bench.py
methodology) to cancel tunnel RTT.

Usage: python tools/bench_grid_sample.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _median_diff  # the repo-root benchmark's timing core


def _chained(fn, n):
    # like bench._chained but for (x, grid)-signature ops
    import jax
    import jax.numpy as jnp

    def f(x, grid):
        def body(c, _):
            out = fn(x + c * 1e-12, grid)  # dependency defeats CSE
            return jnp.mean(out), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    return jax.jit(f)


def bench(shape, gshape, dtype, n1=1, n2=65) -> None:
    import jax
    import jax.numpy as jnp

    from tpgsr_tpu.ops.grid_sample import grid_sample

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape, np.float32).astype(dtype))
    grid = jnp.asarray((rng.random(gshape, np.float32) * 2.2 - 1.1).astype(np.float32))

    for method in ("gather", "contraction"):
        fwd = lambda xx, gg: grid_sample(xx, gg, method=method)

        def fwdbwd(xx, gg):
            def loss(a, b):
                return jnp.sum(grid_sample(a, b, method=method) ** 2)

            gx, ggrad = jax.grad(loss, argnums=(0, 1))(xx, gg)
            return jnp.mean(gx) + jnp.mean(ggrad)

        for tag, fn in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
            f1, f2 = _chained(fn, n1), _chained(fn, n2)
            float(np.asarray(f1(x, grid)))
            float(np.asarray(f2(x, grid)))
            us = _median_diff(f1, f2, (x, grid), n1, n2, trials=5) * 1e6
            print(f"{shape} {dtype.__name__:8s} {method:12s} {tag:8s} {us:8.1f} us")


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices())
    bench((48, 16, 64, 4), (48, 16, 64, 2), np.float32)
    import jax.numpy as jnp

    bench((48, 16, 64, 4), (48, 16, 64, 2), jnp.bfloat16)
    bench((48, 32, 100, 1), (48, 32, 100, 2), np.float32)
