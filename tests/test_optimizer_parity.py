"""Optimizer-UPDATE parity vs torch (VERDICT r2 item 2).

The train-step loss tests prove the loss composition; these prove the
parameter update itself: torch ``Adam(lr=1e-3, betas=(0.5, 0.999))``
(interfaces/base.py:447-449) + per-model ``clip_grad_norm_(0.25)``
(interfaces/super_resolution.py:419-423) vs our
``train/state.make_optimizer`` + ``clip_sr_grads``, including 5-step
bias-correction drift and torch's Bessel-corrected BatchNorm running-var
update (which flax nn.BatchNorm gets wrong — see
tpgsr_tpu.models.layers.TorchBatchNorm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tpgsr_tpu.train.state import clip_sr_grads, make_optimizer


def _tree_to_jnp(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def _run_ours(p0_sr_models, p0_stu, grads_seq, lr=1e-3, beta1=0.5):
    """grads_seq: list over steps of ({model_idx: tree}, stu_tree)."""
    tx = make_optimizer(lr, beta1)
    cur = {
        "sr": tuple(_tree_to_jnp(p) for p in p0_sr_models),
        "stu": (_tree_to_jnp(p0_stu),) if p0_stu is not None else (),
    }
    state = tx.init(cur)
    for g_sr, g_stu in grads_seq:
        grads = {
            "sr": tuple(_tree_to_jnp(g) for g in g_sr),
            "stu": (_tree_to_jnp(g_stu),) if g_stu is not None else (),
        }
        grads = clip_sr_grads(grads)
        updates, state = tx.update(grads, state, cur)
        cur = jax.tree_util.tree_map(lambda p, u: p + u, cur, updates)
    return jax.tree_util.tree_map(np.asarray, cur)


def _run_torch(p0_sr_models, p0_stu, grads_seq, lr=1e-3, beta1=0.5):
    """Mirror of the reference loop: one joint Adam over model_list params +
    student params (base.py:427-463), clip_grad_norm_(0.25) per SR model
    only (super_resolution.py:419-423)."""
    sr_params = [
        {k: torch.nn.Parameter(torch.from_numpy(v.copy())) for k, v in p.items()}
        for p in p0_sr_models
    ]
    stu_params = (
        {k: torch.nn.Parameter(torch.from_numpy(v.copy())) for k, v in p0_stu.items()}
        if p0_stu is not None
        else None
    )
    all_params = [p for m in sr_params for p in m.values()]
    if stu_params is not None:
        all_params += list(stu_params.values())
    opt = torch.optim.Adam(all_params, lr=lr, betas=(beta1, 0.999))
    for g_sr, g_stu in grads_seq:
        opt.zero_grad()
        for m, g in zip(sr_params, g_sr):
            for k in m:
                m[k].grad = torch.from_numpy(g[k].copy())
        if stu_params is not None:
            for k in stu_params:
                stu_params[k].grad = torch.from_numpy(g_stu[k].copy())
        for m in sr_params:  # per-model clip, students unclipped
            torch.nn.utils.clip_grad_norm_(list(m.values()), 0.25)
        opt.step()
    out_sr = [
        {k: v.detach().numpy() for k, v in m.items()} for m in sr_params
    ]
    out_stu = (
        {k: v.detach().numpy() for k, v in stu_params.items()}
        if stu_params is not None
        else None
    )
    return out_sr, out_stu


def _rand_tree(rng, scale=1.0):
    return {
        "w": (scale * rng.standard_normal((4, 3))).astype(np.float32),
        "b": (scale * rng.standard_normal((5,))).astype(np.float32),
    }


def test_adam_clip_five_step_parity(rng):
    """5 Adam steps with per-SR-model clipping: updated params match torch
    to fp32 epsilon (incl. bias-correction drift and a step whose gradient
    norm exceeds the 0.25 clip)."""
    p0_sr = [_rand_tree(rng), _rand_tree(rng)]
    p0_stu = _rand_tree(rng)
    grads_seq = []
    for s in range(5):
        scale = 10.0 if s in (1, 3) else 0.05  # mix clipped/unclipped steps
        grads_seq.append(
            ([_rand_tree(rng, scale), _rand_tree(rng, scale)], _rand_tree(rng, scale))
        )
    ours = _run_ours(p0_sr, p0_stu, grads_seq)
    ref_sr, ref_stu = _run_torch(p0_sr, p0_stu, grads_seq)
    for mine, ref in zip(ours["sr"], ref_sr):
        for k in ref:
            np.testing.assert_allclose(mine[k], ref[k], atol=1e-6)
    for k in ref_stu:
        np.testing.assert_allclose(ours["stu"][0][k], ref_stu[k], atol=1e-6)


def test_students_not_clipped(rng):
    """A huge student gradient must pass through unclipped (the reference
    clips only model_list, super_resolution.py:419-423)."""
    p0_sr = [_rand_tree(rng)]
    p0_stu = _rand_tree(rng)
    grads_seq = [([_rand_tree(rng, 50.0)], _rand_tree(rng, 50.0))]
    ours = _run_ours(p0_sr, p0_stu, grads_seq)
    ref_sr, ref_stu = _run_torch(p0_sr, p0_stu, grads_seq)
    for k in ref_stu:
        np.testing.assert_allclose(ours["stu"][0][k], ref_stu[k], atol=1e-6)
    for k in ref_sr[0]:
        np.testing.assert_allclose(ours["sr"][0][k], ref_sr[0][k], atol=1e-6)


@pytest.mark.parametrize("steps", [1, 4])
def test_batchnorm_running_stats_parity(rng, steps):
    """TorchBatchNorm's running mean/var EMA equals torch BatchNorm2d's
    after N train-mode forwards — including the Bessel n/(n-1) correction
    torch applies to running_var (flax nn.BatchNorm stores the biased
    variance; this was a real divergence, fixed in models/layers.py)."""
    from tpgsr_tpu.models.layers import BatchNorm

    x = rng.standard_normal((6, 5, 7, 3)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(3)
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        tbn.running_mean.normal_(0, 0.1, generator=g)
        tbn.running_var.uniform_(0.5, 1.5, generator=g)
    rm0 = tbn.running_mean.numpy().copy()
    rv0 = tbn.running_var.numpy().copy()
    tbn.train()
    with torch.no_grad():
        for _ in range(steps):
            out_t = tbn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    m = BatchNorm()
    v = m.init(jax.random.PRNGKey(0), x, use_running_average=False)
    v = {
        "params": v["params"],
        "batch_stats": {"BatchNorm_0": {"mean": jnp.asarray(rm0), "var": jnp.asarray(rv0)}},
    }
    for _ in range(steps):
        out, mut = m.apply(v, x, use_running_average=False, mutable=["batch_stats"])
        v = {"params": v["params"], "batch_stats": mut["batch_stats"]}

    bs = jax.tree_util.tree_map(np.asarray, v["batch_stats"]["BatchNorm_0"])
    np.testing.assert_allclose(bs["mean"], tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(bs["var"], tbn.running_var.numpy(), atol=1e-6)
    # train-mode output parity too (normalization uses the biased variance)
    np.testing.assert_allclose(
        np.asarray(out), out_t.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )


def test_batchnorm_eval_uses_running_stats(rng):
    from tpgsr_tpu.models.layers import BatchNorm

    x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(3)
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        tbn.running_mean.normal_(0, 0.5, generator=g)
        tbn.running_var.uniform_(0.5, 1.5, generator=g)
        tbn.weight.normal_(1.0, 0.2, generator=g)
        tbn.bias.normal_(0.0, 0.2, generator=g)
    tbn.eval()
    with torch.no_grad():
        ref = tbn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    m = BatchNorm()
    v = {
        "params": {
            "BatchNorm_0": {
                "scale": jnp.asarray(tbn.weight.detach().numpy()),
                "bias": jnp.asarray(tbn.bias.detach().numpy()),
            }
        },
        "batch_stats": {
            "BatchNorm_0": {
                "mean": jnp.asarray(tbn.running_mean.numpy()),
                "var": jnp.asarray(tbn.running_var.numpy()),
            }
        },
    }
    out = np.asarray(m.apply(v, x, use_running_average=True))
    np.testing.assert_allclose(out, ref.transpose(0, 2, 3, 1), atol=1e-6)
