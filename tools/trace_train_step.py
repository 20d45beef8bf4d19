#!/usr/bin/env python3
"""Capture a device trace of the canonical train step (bench.py config).

Usage:
    python tools/trace_train_step.py [iters]
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/xplane_summary.py '/tmp/jax_trace/plugins/profile/*/[!.]*.xplane.pb' <iters>
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    import jax

    import bench

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30

    # Rebuild the bench train-step setup, then trace `iters` dispatches.
    import jax.numpy as jnp

    from tpgsr_tpu.charset import CTC_NUM_CLASSES
    from tpgsr_tpu.config import default_args, load_config
    from tpgsr_tpu.models.crnn import CRNN
    from tpgsr_tpu.models.registry import ARCHS
    from tpgsr_tpu.models.tsrn import TSRN_TL
    from tpgsr_tpu.train.state import create_train_state
    from tpgsr_tpu.train.step import make_train_step

    b, h, w = bench.BATCH, 16, 64
    args = default_args(arch="tsrn_tl_cascade", STN=True, mask=True,
                        use_distill=True, gradient=True, stu_iter=1, sr_share=True)
    config = load_config()
    sr_model = TSRN_TL(scale_factor=2, width=128, height=32, stn=True, mask=True)
    stu_model = CRNN(nclass=CTC_NUM_CLASSES)
    lr_img = np.zeros((b, h, w, 4), np.float32)
    prior = np.zeros((b, 1, 26, CTC_NUM_CLASSES), np.float32)
    state = create_train_state(
        jax.random.PRNGKey(0), sr_model, (lr_img, prior), n_sr=1,
        stu_model=stu_model,
        stu_example_inputs=(np.zeros((b, 32, 100, 1), np.float32),),
        n_stu=1,
        teacher_variables=stu_model.init(
            jax.random.PRNGKey(1), np.zeros((b, 32, 100, 1), np.float32), train=False
        ),
    )
    step = make_train_step("tsrn_tl_cascade", ARCHS["tsrn_tl_cascade"],
                           sr_model, stu_model, args, config, donate=False)

    rng = np.random.default_rng(0)
    batch = {
        "hr": rng.random((b, 32, 128, 4), np.float32).astype(np.float32),
        "lr": rng.random((b, h, w, 4), np.float32).astype(np.float32),
        "ctc_labels": rng.integers(1, 37, size=(b, 15)).astype(np.int32),
        "ctc_lengths": np.full((b,), 5, np.int32),
        "weighted_tics": np.ones((b,), np.float32),
    }
    batch = jax.device_put(batch)

    s, m = step(state, batch)  # compile + warm
    float(np.asarray(m["loss_total"]))

    with jax.profiler.trace("/tmp/jax_trace"):
        s = state
        for _ in range(iters):
            s, m = step(s, batch)
        print("loss:", float(np.asarray(m["loss_total"])))

    print(f"traced {iters} steps; dtype={config.TRAIN.get('compute_dtype')}")


if __name__ == "__main__":
    main()
