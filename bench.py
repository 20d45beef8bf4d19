#!/usr/bin/env python3
"""Throughput benchmark: TPGSR-TSRN flagship — inference AND train step —
TextZoom geometry LR 16x64(+mask) -> HR 32x128, batch 48 (the canonical
train batch, train_TPGSR-TSRN.sh:1).

Prints ONE JSON line.  Primary metric: inference images/sec/chip (same
metric as round 1 for cross-round comparability); extra fields carry

  * train_images_per_sec        — full train step (grads + clip + Adam,
                                  the config of train_TPGSR-TSRN.sh)
  * train_e2e_images_per_sec    — loader + host->device + chunked-dispatch
                                  steady state (the number a user's wall
                                  clock sees; VERDICT r2 item 5)
  * infer_images_per_sec_batch512 — the YAML-default batch (VERDICT r2
                                  item 4; always-on so regressions show)
  * *_tflops / *_mfu            — achieved FLOP/s from XLA's own cost
                                  analysis of the measured executable ÷
                                  chip peak (VERDICT r2 item 6)

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
# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 (394 int8).  fp32 work also runs
# on the bf16 MXU via passes, so one conservative denominator for both.
PEAK_FLOPS = 197e12
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
            return jnp.mean(out).astype(jnp.float32), None  # bf16-safe carry

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    return jax.jit(f)


def _compiled_with_cost(jitted, args):
    """AOT-compile a jitted fn; return (callable, flops-or-None).

    The compiled executable is the SAME program the timing loop runs, so the
    cost analysis describes exactly what is measured (no extra compile).
    """
    compiled = jitted.lower(*args).compile()
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float((ca or {}).get("flops", 0.0)) or None
    except Exception:
        pass
    return compiled, flops


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


def _bench_inference(batch: int = BATCH, n2: int = N2, trials: int = TRIALS,
                     tile: int = 0):
    """Returns (images/sec, flops-per-forward or None).

    ``tile``: run the forward per batch-tile via lax.map (ops/tiling.py) —
    the shipped path for large eval batches, where XLA's batch-in-lanes
    conv layouts make the flat program ~1.8x slower per image."""
    import jax

    from __graft_entry__ import _flagship

    forward, sr_vars, stu_vars, lr_img = _flagship(batch=batch)
    if tile:
        from tpgsr_tpu.ops.tiling import tiled_apply

        base = forward

        def forward(sv, tv, x):  # noqa: F811 — tiled wrapper, same signature
            return tiled_apply(lambda xx: base(sv, tv, xx), x, tile)

    lr = jax.device_put(np.random.default_rng(0).random(lr_img.shape).astype(np.float32))

    args = (sr_vars, stu_vars, lr)
    f1, flops1 = _compiled_with_cost(_chained(forward, N1), args)
    f2 = _chained(forward, n2)
    float(np.asarray(f1(*args)))  # warm
    float(np.asarray(f2(*args)))
    per_forward = _median_diff(f1, f2, args, N1, n2, trials)
    return batch / per_forward, flops1


def _bench_train(batch: int = BATCH, n2: int = TRAIN_N2,
                 trials: int = TRAIN_TRIALS):
    """Full train step (train_TPGSR-TSRN.sh config: stu_iter=1 --sr_share
    --use_distill --gradient --STN --mask), chained-difference timed.
    Returns (images/sec, flops-per-step or None).

    ``batch``: the train step is measured FLAT (no batch tiling — BatchNorm
    couples the batch, so eval's per-tile trick would change numerics); the
    batch-512 point makes the train-side large-batch layout behavior
    driver-visible (VERDICT r3 item 4)."""
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
    b, h, w = batch, 16, 64
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

    args_ = (state, batch)
    f1, _ = _compiled_with_cost(chained(TRAIN_N1), args_)
    # FLOPs from the RAW step, not the length-1 chain: the chain returns only
    # mean(loss), so XLA dead-code-eliminates the whole backward + Adam
    # update from that executable and its cost analysis reads ~198 GFLOP —
    # forward-only.  The un-DCE'd step (state output live) reports 479
    # GFLOP/batch in BOTH fp32 and bf16 (tools/reconcile_flops.py), matching
    # docs/baseline_derivation.md's 478 hand count.  The TIMED chain is
    # unaffected: each scan iteration's carry feeds the next, so the loop
    # body keeps the full update.
    flops1 = None
    if b == BATCH:  # MFU only uses the batch-48 point; skip the extra compile at 512
        _, flops1 = _compiled_with_cost(jax.jit(step), (state, batch))
    f2 = chained(n2)
    float(np.asarray(f1(*args_)))  # warm
    float(np.asarray(f2(*args_)))
    per_step = _median_diff(f1, f2, args_, TRAIN_N1, n2, trials)
    return b / per_step, flops1


def _bench_train_e2e(chunks: int = 4, k_override: "int | None" = None) -> float:
    """Steady-state END-TO-END training rate: synthetic-LMDB loader ->
    collate -> host->device (uint8 wire) -> chunked k-step dispatch — the
    wall-clock number a real training run sees (docs/perf_notes.md's
    loader+transfer+step row, VERDICT r2 item 5).

    Uses the trainer's own pieces (DataLoader, _chunked_device_prefetch,
    chain step) on a RAM-cached synthetic dataset; timed over ``chunks``
    chunks of TRAIN.dispatch_chain steps after a warmup chunk.
    ``k_override`` replaces the YAML dispatch_chain (the k-sensitivity
    study, tools/bench_dispatch_chain.py).
    """
    import shutil
    import tempfile

    import jax

    from tests.fixtures import make_textzoom_lmdb
    from tpgsr_tpu.config import AttrDict, default_args, load_config, tpg_opt
    from tpgsr_tpu.train import trainer as trainer_mod
    from tpgsr_tpu.train.trainer import TextSR

    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        make_textzoom_lmdb(tmp + "/train", n=96, seed=0)
        args = AttrDict(default_args(
            arch="tsrn_tl_cascade", STN=True, mask=True, use_distill=True,
            gradient=True, stu_iter=1, sr_share=True, batch_size=BATCH,
        ))
        config = load_config()
        t = config.TRAIN
        t.batch_size = BATCH
        t.train_data_dir = [tmp + "/train"]
        t.cache_images = True
        # steps per dispatch — the YAML ships dispatch_chain: 50, so the
        # bench measures exactly what train_TPGSR-TSRN.sh gets.
        k = max(1, int(k_override if k_override is not None
                       else t.get("dispatch_chain", 1)))
        t.dispatch_chain = k
        mission = TextSR(config, args, tpg_opt())
        loader = mission.get_train_data()
        state = mission.init_state()
        chain = mission._build_chain_step()

        class _Epochs:
            """Re-iterate the loader across epochs (the trainer builds one
            prefetch per epoch; the bench needs a continuous stream)."""

            def __init__(self, loader):
                self.loader = loader

            def __iter__(self):
                e = 0
                while True:
                    self.loader._epoch = e
                    yield from iter(self.loader)
                    e += 1

        src = _Epochs(loader)

        def run(n_chunks, state):
            from tpgsr_tpu.train.step import train_wire_keys

            it = trainer_mod._chunked_device_prefetch(
                src, mission.mesh, [k] * n_chunks,
                keys=train_wire_keys("tsrn_tl_cascade"))
            last = None
            for kk, stacked in it:
                state, ms = chain(state, stacked)
                last = ms["loss_total"]
            float(np.asarray(last)[-1])  # force completion
            return state

        state = run(1, state)  # warm: compile + populate decode cache
        # median of 3 independent windows: the e2e number is host+tunnel
        # sensitive and a single window swings with transient VM/tunnel
        # load (observed 2026-08-20: same config, 1.7k-2.4k img/s across
        # runs hours apart); the median pins repeat runs much tighter
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            state = run(chunks, state)
            dt = time.perf_counter() - t0
            rates.append(chunks * k * BATCH / dt)
        return float(np.median(rates))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


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

    infer_ips, infer_flops = _bench_inference()
    # batch 512 (the YAML-default TRAIN.batch_size): always-on so the
    # large-batch point is driver-visible (VERDICT r2 item 4).  Measured on
    # the shipped tiled path (ops/tiling.py; the eval step tiles by default).
    # Best-effort like e2e: an OOM/tunnel hiccup at the large batch must not
    # sink the primary batch-48 metric.
    try:
        infer512_ips, _ = _bench_inference(batch=512, n2=9, trials=3, tile=64)
    except Exception as e:
        print(f"bench.py: batch-512 measurement failed: {e!r}", file=sys.stderr)
        infer512_ips = None
    train_ips, train_flops = _bench_train()
    # batch-512 TRAIN point (VERDICT r3 item 4): measured flat (BN couples
    # the batch; eval-style tiling would change numerics).  Best-effort.
    try:
        train512_ips, _ = _bench_train(batch=512, n2=3, trials=3)
    except Exception as e:
        print(f"bench.py: train batch-512 measurement failed: {e!r}",
              file=sys.stderr)
        train512_ips = None
    try:
        e2e_ips = _bench_train_e2e()
    except Exception as e:  # e2e is best-effort: never sink the primary metric
        print(f"bench.py: e2e measurement failed: {e!r}", file=sys.stderr)
        e2e_ips = None

    def tflops(ips, flops_per_call, batch):
        if not flops_per_call:
            return None
        return ips / batch * flops_per_call / 1e12

    infer_tf = tflops(infer_ips, infer_flops, BATCH)
    train_tf = tflops(train_ips, train_flops, BATCH)
    print(
        json.dumps(
            {
                "metric": "tpgsr_tsrn_inference_images_per_sec_per_chip",
                "value": round(infer_ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(infer_ips / BASELINE_V100_INFER_IPS, 2),
                **({"infer_images_per_sec_batch512": round(infer512_ips, 2)}
                   if infer512_ips else {}),
                "train_images_per_sec": round(train_ips, 2),
                **({"train_images_per_sec_batch512": round(train512_ips, 2)}
                   if train512_ips else {}),
                "train_vs_baseline": round(train_ips / BASELINE_V100_TRAIN_IPS, 2),
                **({"train_e2e_images_per_sec": round(e2e_ips, 2)} if e2e_ips else {}),
                **({"infer_tflops": round(infer_tf, 2),
                    "infer_mfu": round(infer_tf * 1e12 / PEAK_FLOPS, 4)} if infer_tf else {}),
                **({"train_tflops": round(train_tf, 2),
                    "train_mfu": round(train_tf * 1e12 / PEAK_FLOPS, 4)} if train_tf else {}),
                # MFU denominators are the bf16 MXU peak regardless of
                # compute dtype (fp32 work runs on the same MXU via
                # multi-pass); stated so fp32-config numbers read correctly.
                **({"mfu_basis": "bf16 peak 197 TFLOP/s"}
                   if (infer_tf or train_tf) else {}),
                "train_dtype": _train_dtype(),
                "baseline_basis": "derived V100 estimate (docs/baseline_derivation.md)",
            }
        )
    )
    watchdog.cancel()


if __name__ == "__main__":
    main()
