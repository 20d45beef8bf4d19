#!/usr/bin/env python3
"""bf16 end-to-end inference attempt (VERDICT r3 item 5).

docs/perf_notes.md records: full-bf16 inference measured 4.00 ms vs 3.84 fp32
— the SR trunk is flat and the CRNN prior branch is ~3x SLOWER in bf16
(relayout/tile effects at its tiny channel counts), naming a "recalibrated
CRNN input adapter" as the remaining lever.  This tool measures that lever's
candidates head-to-head on the real chip (chained-length differencing, same
methodology as bench.py):

  fp32            — the shipped parity path (baseline)
  bf16_all        — params+input cast to bf16 (the prior loser, re-measured)
  bf16_sr_only    — SR trunk bf16, CRNN branch + adapter fp32 (prior stays
                    fp32, cast at the SR boundary)
  bf16_pad8       — all-bf16 but the CRNN input zero-padded 1 -> 8 channels
                    with a matching zero-padded conv0 kernel (numerically
                    EXACT: extra input channels are zero and their kernel
                    rows are zero) — attacks the tiny-channel relayout
  bf16_fp32_adapt — all-bf16 except parse_crnn_data (bicubic 32x100 resize +
                    gray) runs fp32; cast to bf16 at the CRNN input

Ship bar (VERDICT): >= 5% on the flagship metric, else record the floor in
docs/perf_notes.md and close the lever.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import _chained, _median_diff  # noqa: E402

BATCH = 48
N1, N2 = 1, 33
TRIALS = 5


def _cast_tree(tree, dtype):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, tree
    )


def _variants():
    import jax.numpy as jnp

    from tpgsr_tpu.charset import CTC_NUM_CLASSES
    from tpgsr_tpu.models.crnn import CRNN
    from tpgsr_tpu.models.tsrn import TSRN_TL
    from tpgsr_tpu.train.priors import logits_to_prior, parse_crnn_data
    import jax

    sr_model = TSRN_TL(scale_factor=2, width=128, height=32, stn=True, mask=True)
    stu_model = CRNN(nclass=CTC_NUM_CLASSES)
    rng = jax.random.PRNGKey(0)
    lr_img = np.zeros((BATCH, 16, 64, 4), np.float32)
    prior = np.zeros((BATCH, 1, 26, CTC_NUM_CLASSES), np.float32)
    stu_vars = stu_model.init(rng, np.zeros((BATCH, 32, 100, 1), np.float32), train=False)
    sr_vars = sr_model.init(rng, lr_img, prior, train=False)

    def fwd_fp32(sv, tv, x):
        logits = stu_model.apply(tv, parse_crnn_data(x), train=False)
        return sr_model.apply(sv, x, logits_to_prior(logits), train=False)

    def fwd_bf16_all(sv, tv, x):
        sv = _cast_tree(sv, jnp.bfloat16)
        tv = _cast_tree(tv, jnp.bfloat16)
        x = x.astype(jnp.bfloat16)
        logits = stu_model.apply(tv, parse_crnn_data(x), train=False)
        return sr_model.apply(sv, x, logits_to_prior(logits), train=False)

    def fwd_bf16_sr_only(sv, tv, x):
        sv = _cast_tree(sv, jnp.bfloat16)
        logits = stu_model.apply(tv, parse_crnn_data(x), train=False)
        pr = logits_to_prior(logits).astype(jnp.bfloat16)
        return sr_model.apply(sv, x.astype(jnp.bfloat16), pr, train=False)

    def _pad8(tv):
        # zero-pad conv0's kernel [3,3,1,64] -> [3,3,8,64]; zero-padded input
        # channels contribute 0 to the conv output (exact numerics)
        tv = jax.tree_util.tree_map(lambda a: a, tv)  # shallow copy via map
        d = {k: dict(v) for k, v in tv.items()}
        p = {k: dict(v) for k, v in d["params"].items()}
        c0 = dict(p["conv0"])
        k = c0["kernel"]
        c0["kernel"] = jnp.pad(k, ((0, 0), (0, 0), (0, 7), (0, 0)))
        p["conv0"] = c0
        d["params"] = p
        return d

    def fwd_bf16_pad8(sv, tv, x):
        sv = _cast_tree(sv, jnp.bfloat16)
        tv = _cast_tree(_pad8(tv), jnp.bfloat16)
        x = x.astype(jnp.bfloat16)
        stu_in = parse_crnn_data(x)
        stu_in = jnp.pad(stu_in, ((0, 0), (0, 0), (0, 0), (0, 7)))
        logits = stu_model.apply(tv, stu_in, train=False)
        return sr_model.apply(sv, x, logits_to_prior(logits), train=False)

    def fwd_bf16_fp32_adapt(sv, tv, x):
        sv = _cast_tree(sv, jnp.bfloat16)
        tv = _cast_tree(tv, jnp.bfloat16)
        stu_in = parse_crnn_data(x).astype(jnp.bfloat16)  # adapter in fp32
        logits = stu_model.apply(tv, stu_in, train=False)
        return sr_model.apply(sv, x.astype(jnp.bfloat16),
                              logits_to_prior(logits), train=False)

    return {
        "fp32": fwd_fp32,
        "bf16_all": fwd_bf16_all,
        "bf16_sr_only": fwd_bf16_sr_only,
        "bf16_pad8": fwd_bf16_pad8,
        "bf16_fp32_adapt": fwd_bf16_fp32_adapt,
    }, sr_vars, stu_vars, lr_img


def main() -> None:
    import jax

    variants, sr_vars, stu_vars, lr_img = _variants()
    sel = [a for a in sys.argv[1:] if not a.startswith("-")]
    if sel:  # measure only the named variants (e.g. after a timeout cut a run short)
        variants = {k: v for k, v in variants.items() if k in sel}
    lr = jax.device_put(
        np.random.default_rng(0).random(lr_img.shape).astype(np.float32))
    args = (sr_vars, stu_vars, lr)
    out = {}
    for name, fwd in variants.items():
        f1 = _chained(fwd, N1)
        f2 = _chained(fwd, N2)
        float(np.asarray(f1(*args)))  # warm/compile
        float(np.asarray(f2(*args)))
        per = _median_diff(f1, f2, args, N1, N2, TRIALS)
        out[name] = round(BATCH / per, 1)
        print(f"{name}: {out[name]} img/s", file=sys.stderr, flush=True)
    out["best"] = max(out, key=lambda k: out[k])
    if "fp32" in out:
        out["best_vs_fp32"] = round(max(out[k] for k in variants) / out["fp32"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
