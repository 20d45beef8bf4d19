#!/usr/bin/env python3
"""Reconcile the repo's two FLOPs accountings (VERDICT r3 item 3).

docs/baseline_derivation.md says the flagship train step is 478 GFLOP/batch
(basis of the V100 estimate); BENCH_r03's measured-executable cost analysis
backs out ~198 GFLOP/batch for the bf16 program.  This script compiles the
SAME train step under fp32 and bf16 (and the inference forward in both) and
prints XLA's cost-analysis FLOPs for each, so the discrepancy is pinned to
its cause (expected: the fp32 program's convs are decomposed into multiple
bf16 MXU passes that the analysis counts, or the bf16 fusions undercount).

Run on the real TPU backend (compile-only; no meaningful device time).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def train_flops(dtype: str) -> float:
    import jax
    import numpy as np

    from tpgsr_tpu.charset import CTC_NUM_CLASSES
    from tpgsr_tpu.config import default_args, load_config
    from tpgsr_tpu.models.crnn import CRNN
    from tpgsr_tpu.models.registry import ARCHS
    from tpgsr_tpu.models.tsrn import TSRN_TL
    from tpgsr_tpu.train.state import create_train_state
    from tpgsr_tpu.train.step import make_train_step

    args = default_args(arch="tsrn_tl_cascade", STN=True, mask=True,
                        use_distill=True, gradient=True, stu_iter=1,
                        sr_share=True)
    config = load_config()
    config.TRAIN.compute_dtype = dtype
    b, h, w = 48, 16, 64
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
            jax.random.PRNGKey(1), np.zeros((b, 32, 100, 1), np.float32),
            train=False),
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
    compiled = jax.jit(step).lower(state, batch).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float((ca or {}).get("flops", 0.0))


def infer_flops(dtype) -> float:
    import jax

    from __graft_entry__ import _flagship

    forward, sr_vars, stu_vars, lr_img = _flagship(batch=48)

    def f(sv, tv, x):
        if dtype is not None:
            import jax.numpy as jnp

            sv = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, sv)
            tv = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, tv)
            x = x.astype(jnp.bfloat16)
        return forward(sv, tv, x)

    compiled = jax.jit(f).lower(sr_vars, stu_vars, lr_img).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float((ca or {}).get("flops", 0.0))


def main() -> None:
    out = {}
    out["train_fp32_gflops"] = round(train_flops("fp32") / 1e9, 2)
    out["train_bf16_gflops"] = round(train_flops("bf16") / 1e9, 2)
    out["infer_fp32_gflops"] = round(infer_flops(None) / 1e9, 2)
    out["infer_bf16_gflops"] = round(infer_flops("bf16") / 1e9, 2)
    out["ratio_train"] = round(out["train_fp32_gflops"] / max(out["train_bf16_gflops"], 1e-9), 3)
    out["ratio_infer"] = round(out["infer_fp32_gflops"] / max(out["infer_bf16_gflops"], 1e-9), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
