"""Numerical parity of flax models vs torch golden implementations
(weights converted with tpgsr_tpu.interop.torch_import)."""

import numpy as np
import pytest
import torch

from tests.torch_mirror import build_torch_crnn, build_torch_infogen, build_torch_srb_tl
from tpgsr_tpu.interop import torch_import as ti
from tpgsr_tpu.models.crnn import CRNN
from tpgsr_tpu.models.layers import pixel_shuffle
from tpgsr_tpu.models.tsrn import InfoGen, RecurrentResidualBlockTL


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_pixel_shuffle_matches_torch(rng):
    x = rng.standard_normal((2, 4, 6, 16)).astype(np.float32)
    ours = np.asarray(pixel_shuffle(x, 2))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = torch.pixel_shuffle(xt, 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_crnn_matches_torch(rng):
    tm = build_torch_crnn().eval()
    variables = ti.import_crnn(_sd(tm))
    x = rng.random((2, 32, 100, 1), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()  # [T,B,C]
    ours = np.asarray(CRNN().apply(variables, x, train=False))
    assert ours.shape == ref.shape == (26, 2, 37)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_infogen_matches_torch(rng):
    tm = build_torch_infogen().eval()
    sd = _sd(tm)
    params, stats = {}, {}
    for k in (1, 2, 3, 4):
        ti._convT(params, sd, f"tconv{k}", (f"tconv{k}",))
        ti._bn(params, stats, sd, f"bn{k}", (f"bn{k}",))
    t = rng.random((2, 1, 26, 37), dtype=np.float32)  # NHWC prior
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(t, (0, 3, 1, 2)))).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(
        InfoGen(37, 32).apply({"params": params, "batch_stats": stats}, t, train=False)
    )
    assert ours.shape == ref.shape  # [B, 1, 203, 32]
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_srb_tl_matches_torch(rng):
    tm = build_torch_srb_tl(channels=16, text_channels=8).eval()
    sd = _sd(tm)
    params, stats = {}, {}
    ti._conv(params, sd, "conv1", ("conv1",))
    ti._bn(params, stats, sd, "bn1", ("bn1",))
    ti._conv(params, sd, "conv2", ("conv2",))
    ti._bn(params, stats, sd, "bn2", ("bn2",))
    for g in ("gru1", "gru2"):
        ti._conv(params, sd, f"{g}.conv1", (g, "conv1"))
        ti._rnn(params, sd, f"{g}.gru", (g, "gru"))
    x = rng.random((2, 8, 16, 16), dtype=np.float32)
    temb = rng.random((2, 8, 16, 8), dtype=np.float32)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(temb, (0, 3, 1, 2))),
        ).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(
        RecurrentResidualBlockTL(16, 8).apply(
            {"params": params, "batch_stats": stats}, x, temb, train=False
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_full_tsrn_tl_matches_torch(rng):
    """END-TO-END flagship parity: torch TSRN_TL -> import_tsrn -> flax,
    identical outputs on the same input+prior."""
    from tests.torch_mirror import build_torch_tsrn_tl
    from tpgsr_tpu.models.tsrn import TSRN_TL

    tm = build_torch_tsrn_tl(srb_nums=3, hidden_units=8, out_text_channels=8).eval()
    variables = ti.import_tsrn(_sd(tm), srb_nums=3)
    x = rng.random((2, 16, 32, 4), dtype=np.float32)
    prior = rng.random((2, 1, 26, 37), dtype=np.float32)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(prior, (0, 3, 1, 2))),
        ).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(
        TSRN_TL(scale_factor=2, mask=True, srb_nums=3, hidden_units=8,
                out_text_channels=8).apply(variables, x, prior, train=False)
    )
    assert ours.shape == ref.shape == (2, 32, 64, 4)
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_full_tsrn_tl_stn_params_import(rng):
    """STN head weights also flow through import_tsrn (train-mode modules)."""
    from tests.torch_mirror import build_torch_tsrn_tl
    from tpgsr_tpu.interop.torch_import import _import_stn_head

    tm = build_torch_tsrn_tl(srb_nums=2, hidden_units=8, out_text_channels=8)
    sd = _sd(tm)
    # no stn in the mirror: just assert the importer skips cleanly
    variables = ti.import_tsrn(sd, srb_nums=2)
    assert "stn_head" not in variables["params"]


def test_full_tsrn_tl_gradient_parity(rng):
    """Backprop parity through the ENTIRE TSRN_TL: dL/dx and dL/dprior of an
    MSE loss match torch autograd on the same golden weights.  This checks
    every layer's backward (convs, BN, GRU scans, InfoGen deconvs, fused SR
    head, PReLU, mish, tanh) chained end-to-end."""
    import jax
    import jax.numpy as jnp

    from tests.torch_mirror import build_torch_tsrn_tl
    from tpgsr_tpu.models.tsrn import TSRN_TL

    torch.manual_seed(0)  # golden weights independent of suite order
    tm = build_torch_tsrn_tl(srb_nums=2, hidden_units=8, out_text_channels=8).eval()
    variables = ti.import_tsrn(_sd(tm), srb_nums=2)
    x = rng.random((2, 16, 32, 4), dtype=np.float32)
    prior = rng.random((2, 1, 26, 37), dtype=np.float32)
    tgt = rng.random((2, 32, 64, 4), dtype=np.float32)

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_(True)
    pt = torch.from_numpy(np.transpose(prior, (0, 3, 1, 2))).requires_grad_(True)
    out = tm(xt, pt)
    loss = ((out - torch.from_numpy(np.transpose(tgt, (0, 3, 1, 2)))) ** 2).mean()
    loss.backward()
    gx_ref = xt.grad.numpy().transpose(0, 2, 3, 1)
    gp_ref = pt.grad.numpy().transpose(0, 2, 3, 1)

    model = TSRN_TL(scale_factor=2, mask=True, srb_nums=2, hidden_units=8,
                    out_text_channels=8)

    def loss_fn(x, p):
        out = model.apply(variables, x, p, train=False)
        return jnp.mean((out - tgt) ** 2)

    l, (gx, gp) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(prior)
    )
    np.testing.assert_allclose(float(l), float(loss.detach()), rtol=1e-5)
    # tolerance relative to the gradient scale (fp32 accumulation-order
    # differences through 2 SRBs + InfoGen + head)
    for ours, ref in ((gx, gx_ref), (gp, gp_ref)):
        scale = np.abs(ref).max()
        # relative to gradient scale with an absolute floor (near-zero
        # gradient tensors, e.g. the prior grads, compare at fp32 noise)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4 * scale + 1e-6)


def test_crnn_gradient_parity(rng):
    """dL/dx of the CRNN (student TPG) matches torch autograd — the student
    trains jointly with the SR model, so its backward matters too."""
    import jax
    import jax.numpy as jnp

    torch.manual_seed(0)  # golden weights independent of suite order
    tm = build_torch_crnn().eval()
    variables = ti.import_crnn(_sd(tm))
    x = rng.random((2, 32, 100, 1), dtype=np.float32)

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_(True)
    out = tm(xt)  # [T, B, C]
    loss = (out ** 2).mean()
    loss.backward()
    gx_ref = xt.grad.numpy().transpose(0, 2, 3, 1)

    model = CRNN(nclass=37)

    def loss_fn(x):
        logits = model.apply(variables, x, train=False)
        return jnp.mean(logits ** 2)

    l, gx = jax.value_and_grad(loss_fn)(jnp.asarray(x))
    np.testing.assert_allclose(float(l), float(loss.detach()), rtol=1e-5)
    scale = np.abs(gx_ref).max()
    np.testing.assert_allclose(np.asarray(gx), gx_ref, atol=5e-4 * scale + 1e-6)
