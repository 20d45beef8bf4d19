#!/usr/bin/env python3
"""Throughput benchmark: TPGSR-TSRN flagship — inference AND train step —
TextZoom geometry LR 16x64(+mask) -> HR 32x128, batch 48 (the canonical
train batch, train_TPGSR-TSRN.sh:1).

Prints ONE JSON line.  Primary metric: inference images/sec/chip (same
metric as round 1 for cross-round comparability); the full train-step
throughput (grads + clip + Adam, the config of train_TPGSR-TSRN.sh) is
carried in the extra fields train_images_per_sec / train_vs_baseline.

Methodology: the TPU here sits behind a remote tunnel whose
``block_until_ready`` returns before execution finishes and whose round-trip
latency (~40 ms) dwarfs the kernels. So we time TWO jit programs that chain
N1 and N2 iterations inside one ``lax.scan`` (with a scalar readback forcing
real completion) and difference them:
    t_iter = (t(N2) - t(N1)) / (N2 - N1)
which cancels the round-trip and measures pure device throughput.  A single
estimate swings +-12%; the median over TRIALS independent estimates pins
repeat runs within ~2%.

Baseline: the reference publishes no fps.  The V100 figures are DERIVED
estimates — measured FLOPs (XLA cost analysis) / (V100 fp32 peak x 30%
sustained) + a cuDNN RNN serial tail; full arithmetic and bracket in
docs/baseline_derivation.md.  The measured img/s is primary; vs_baseline is
the bracketed estimate's central value.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Derived V100 estimates (docs/baseline_derivation.md) — NOT measurements.
BASELINE_V100_INFER_IPS = 1400.0
BASELINE_V100_TRAIN_IPS = 450.0
BATCH = 48
N1, N2 = 1, 33
TRAIN_N1, TRAIN_N2 = 1, 9
REPS = 4
TRIALS = 7
TRAIN_TRIALS = 5


def _chained(forward, n):
    import jax
    import jax.numpy as jnp

    def f(sv, tv, x):
        def body(c, _):
            out = forward(sv, tv, x + c * 1e-12)  # dependency defeats CSE
            return jnp.mean(out), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    return jax.jit(f)


def _time_call(fn, args, reps=REPS) -> float:
    t0 = time.perf_counter()
    for _ in range(reps):
        float(np.asarray(fn(*args)))  # scalar readback = real completion
    return (time.perf_counter() - t0) / reps


def _median_diff(f1, f2, args, n1, n2, trials) -> float:
    est = []
    for _ in range(trials):
        t1 = _time_call(f1, args)
        t2 = _time_call(f2, args)
        est.append((t2 - t1) / (n2 - n1))
    return float(np.median(est))


def _bench_inference(batch: int = BATCH, n2: int = N2, trials: int = TRIALS) -> float:
    import jax

    from __graft_entry__ import _flagship

    forward, sr_vars, stu_vars, lr_img = _flagship(batch=batch)
    lr = jax.device_put(np.random.default_rng(0).random(lr_img.shape).astype(np.float32))

    f1 = _chained(forward, N1)
    f2 = _chained(forward, n2)
    args = (sr_vars, stu_vars, lr)
    float(np.asarray(f1(*args)))  # compile + warm
    float(np.asarray(f2(*args)))
    per_forward = _median_diff(f1, f2, args, N1, n2, trials)
    return batch / per_forward


def _bench_train() -> float:
    """Full train step (train_TPGSR-TSRN.sh config: stu_iter=1 --sr_share
    --use_distill --gradient --STN --mask), chained-difference timed."""
    import jax
    import jax.numpy as jnp

    from tpgsr_tpu.charset import CTC_NUM_CLASSES
    from tpgsr_tpu.config import default_args, load_config
    from tpgsr_tpu.models.crnn import CRNN
    from tpgsr_tpu.models.registry import ARCHS
    from tpgsr_tpu.models.tsrn import TSRN_TL
    from tpgsr_tpu.train.state import create_train_state
    from tpgsr_tpu.train.step import make_train_step

    args = default_args(arch="tsrn_tl_cascade", STN=True, mask=True,
                        use_distill=True, gradient=True, stu_iter=1, sr_share=True)
    config = load_config()
    b, h, w = BATCH, 16, 64
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

    def chained(n):
        def f(state, batch):
            def body(s, _):
                s, m = step(s, batch)
                return s, m["loss_total"]

            _, losses = jax.lax.scan(body, state, None, length=n)
            return jnp.mean(losses)

        return jax.jit(f)

    f1, f2 = chained(TRAIN_N1), chained(TRAIN_N2)
    args_ = (state, batch)
    float(np.asarray(f1(*args_)))  # compile + warm
    float(np.asarray(f2(*args_)))
    per_step = _median_diff(f1, f2, args_, TRAIN_N1, TRAIN_N2, TRAIN_TRIALS)
    return BATCH / per_step


def _train_dtype() -> str:
    from tpgsr_tpu.config import load_config

    return str(load_config().TRAIN.get("compute_dtype", "fp32"))


def main() -> None:
    import os
    import sys
    import threading

    # Watchdog: a wedged TPU tunnel hangs inside backend init / the first
    # device op with no exception to catch (observed 2026-08-17: even
    # jax.devices() blocks forever).  Force a clean failure instead so the
    # caller records an error rather than hanging.
    deadline = float(os.environ.get("BENCH_TIMEOUT_S", "1500"))

    def _abort():
        print(
            f"bench.py: no result within {deadline:.0f}s — TPU backend "
            "likely unreachable (wedged tunnel); aborting",
            file=sys.stderr,
            flush=True,
        )
        os._exit(3)

    watchdog = threading.Timer(deadline, _abort)
    watchdog.daemon = True
    watchdog.start()

    infer_ips = _bench_inference()
    # batch 512 (the YAML default TRAIN.batch_size) as a secondary datapoint.
    # Measured 2026-08-17: 6.8k img/s — *lower* than batch 48's 12k (the GRU
    # scans do NOT amortize; layout copies scale with batch).  Off by
    # default: the driver's bench budget is tight through the tunnel, and
    # batch 48 is both the canonical config and the faster point.  Record
    # lives in docs/perf_notes.md.
    infer512_ips = (
        _bench_inference(batch=512, n2=9, trials=3) if os.environ.get("BENCH_B512") else None
    )
    train_ips = _bench_train()
    print(
        json.dumps(
            {
                "metric": "tpgsr_tsrn_inference_images_per_sec_per_chip",
                "value": round(infer_ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(infer_ips / BASELINE_V100_INFER_IPS, 2),
                **(
                    {"infer_images_per_sec_batch512": round(infer512_ips, 2)}
                    if infer512_ips is not None
                    else {}
                ),
                "train_images_per_sec": round(train_ips, 2),
                "train_vs_baseline": round(train_ips / BASELINE_V100_TRAIN_IPS, 2),
                "train_dtype": _train_dtype(),
                "baseline_basis": "derived V100 estimate (docs/baseline_derivation.md)",
            }
        )
    )
    watchdog.cancel()


if __name__ == "__main__":
    main()
