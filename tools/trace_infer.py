#!/usr/bin/env python3
"""Capture a device trace of the flagship inference forward (bench.py config).

Usage:
    python tools/trace_infer.py [batch] [iters]
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/xplane_summary.py '/tmp/jax_trace_infer/plugins/profile/*/[!.]*.xplane.pb' <iters>
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    import jax

    from __graft_entry__ import _flagship

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    forward, sr_vars, stu_vars, lr_img = _flagship(batch=batch)
    fwd = jax.jit(forward)
    lr = jax.device_put(
        np.random.default_rng(0).random(lr_img.shape).astype(np.float32))

    out = fwd(sr_vars, stu_vars, lr)  # compile + warm
    float(np.asarray(out).mean())

    with jax.profiler.trace("/tmp/jax_trace_infer"):
        for _ in range(iters):
            out = fwd(sr_vars, stu_vars, lr)
        print("mean:", float(np.asarray(out).mean()))
    print(f"traced {iters} forwards at batch {batch}")


if __name__ == "__main__":
    main()
