"""Reference-code parity for the full SR backbone zoo.

The TSRN family already has reference-parity coverage
(test_reference_parity.py); the other backbones were only shape-smoke
tested.  These tests import the reference's OWN model files
(model/{srcnn,srresnet,rdn,vdsr,edsr,lapsrn,esrgan,rrdb}.py) under
torch-CPU, randomize their weights and BN running stats, carry the
state_dict across via tpgsr_tpu.interop.torch_import, and assert
weight-for-weight forward equality in eval mode.

This tier exists because golden-mirror tests can share a misreading with
the implementation (it caught a real (2,1)-vs-(2,2) maxpool bug in the OPT
VGG extractor); nothing is copied from the reference — its modules are
imported read-only at test time.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

from tests.reference_loader import load_reference_module, reference_available
from tpgsr_tpu.interop import torch_import as ti

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference checkout not present"
)


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _randomize(model, seed=0, scale=0.05):
    """Uniform weights + non-trivial BN running stats so eval-mode parity is
    a real test."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-scale, scale, generator=g)
    for m in model.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.normal_(0.0, 0.1, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)


def _nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _run_ref(tm, *args):
    tm.eval()
    with torch.no_grad():
        out = tm(*[torch.from_numpy(a) for a in args])
    return out.numpy()


def _prior(rng, b=2, t=26, classes=37):
    """Text prior: torch side [B, classes, 1, T]; ours [B, 1, T, classes]."""
    p = rng.random((b, classes, 1, t), dtype=np.float32)
    return p, np.ascontiguousarray(np.transpose(p, (0, 2, 3, 1)))


def test_reference_srcnn(rng):
    from tpgsr_tpu.models.srcnn import SRCNN

    ref_mod = load_reference_module("model.srcnn")
    tm = ref_mod.SRCNN(scale_factor=2, in_planes=3, STN=False)
    _randomize(tm)
    x = rng.random((2, 3, 16, 64), dtype=np.float32)
    ref = _run_ref(tm, x)
    ours = SRCNN(scale_factor=2, in_planes=3, stn=False).apply(
        ti.import_srcnn(_sd(tm)), _nhwc(x), train=False
    )
    np.testing.assert_allclose(_nhwc(ref), np.asarray(ours), atol=1e-5)


def test_reference_srcnn_tl(rng):
    from tpgsr_tpu.models.srcnn import SRCNN_TL

    ref_mod = load_reference_module("model.srcnn")
    tm = ref_mod.SRCNN_TL(scale_factor=2, in_planes=4, STN=False)
    _randomize(tm, seed=1)
    x = rng.random((2, 4, 16, 64), dtype=np.float32)
    pt, pj = _prior(rng)
    ref = _run_ref(tm, x, pt)
    ours = SRCNN_TL(scale_factor=2, in_planes=4, stn=False).apply(
        ti.import_srcnn(_sd(tm)), _nhwc(x), pj, train=False
    )
    np.testing.assert_allclose(_nhwc(ref), np.asarray(ours), atol=1e-5)


def test_reference_srresnet(rng):
    from tpgsr_tpu.models.srresnet import SRResNet

    ref_mod = load_reference_module("model.srresnet")
    tm = ref_mod.SRResNet(scale_factor=2, STN=False, mask=True)
    _randomize(tm, seed=2)
    x = rng.random((2, 4, 16, 64), dtype=np.float32)
    ref = _run_ref(tm, x)
    ours = SRResNet(scale_factor=2, stn=False, mask=True).apply(
        ti.import_srresnet(_sd(tm)), _nhwc(x), train=False
    )
    np.testing.assert_allclose(_nhwc(ref), np.asarray(ours), atol=1e-5)


def test_reference_srresnet_tl(rng):
    from tpgsr_tpu.models.srresnet import SRResNet_TL

    ref_mod = load_reference_module("model.srresnet")
    tm = ref_mod.SRResNet_TL(scale_factor=2, STN=False, mask=True)
    _randomize(tm, seed=3)
    x = rng.random((2, 4, 16, 64), dtype=np.float32)
    pt, pj = _prior(rng)
    ref = _run_ref(tm, x, pt)
    ours = SRResNet_TL(scale_factor=2, stn=False, mask=True).apply(
        ti.import_srresnet(_sd(tm)), _nhwc(x), pj, train=False
    )
    np.testing.assert_allclose(_nhwc(ref), np.asarray(ours), atol=1e-5)


def test_reference_rdn(rng):
    from tpgsr_tpu.models.rdn import RDN

    ref_mod = load_reference_module("model.rdn")
    tm = ref_mod.RDN(scale_factor=2)
    _randomize(tm, seed=4)
    x = rng.random((2, 3, 16, 64), dtype=np.float32)
    ref = _run_ref(tm, x)
    ours = RDN(scale_factor=2).apply(ti.import_rdn(_sd(tm)), _nhwc(x), train=False)
    np.testing.assert_allclose(_nhwc(ref), np.asarray(ours), atol=1e-5)


def test_reference_rdn_tl(rng):
    from tpgsr_tpu.models.rdn import RDN_TL

    ref_mod = load_reference_module("model.rdn")
    tm = ref_mod.RDN_TL(scale_factor=2)
    _randomize(tm, seed=5)
    x = rng.random((2, 4, 16, 64), dtype=np.float32)
    pt, pj = _prior(rng)
    ref = _run_ref(tm, x, pt)
    ours = RDN_TL(scale_factor=2).apply(
        ti.import_rdn(_sd(tm)), _nhwc(x), pj, train=False
    )
    np.testing.assert_allclose(_nhwc(ref), np.asarray(ours), atol=1e-5)


def test_reference_vdsr(rng):
    from tpgsr_tpu.models.vdsr import VDSR

    ref_mod = load_reference_module("model.vdsr")
    tm = ref_mod.VDSR(scale_factor=2, in_planes=3, width=128, height=32)
    _randomize(tm, seed=6)
    x = rng.random((2, 3, 16, 64), dtype=np.float32)
    ref = _run_ref(tm, x)
    ours = VDSR(scale_factor=2, in_planes=3).apply(
        ti.import_vdsr(_sd(tm)), _nhwc(x), train=False
    )
    np.testing.assert_allclose(_nhwc(ref), np.asarray(ours), atol=1e-5)


def test_reference_vdsr_tl(rng):
    from tpgsr_tpu.models.vdsr import VDSR_TL

    ref_mod = load_reference_module("model.vdsr")
    # trainer passes cfg.width=128, cfg.height=32 (interfaces/base.py:367)
    tm = ref_mod.VDSR_TL(scale_factor=2, in_planes=4, width=128, height=32)
    _randomize(tm, seed=7)
    x = rng.random((2, 4, 16, 64), dtype=np.float32)
    pt, pj = _prior(rng)
    ref = _run_ref(tm, x, pt)
    ours = VDSR_TL(scale_factor=2, in_planes=4, width=128, height=32).apply(
        ti.import_vdsr(_sd(tm)), _nhwc(x), pj, train=False
    )
    np.testing.assert_allclose(_nhwc(ref), np.asarray(ours), atol=1e-5)


def test_reference_edsr(rng):
    from tpgsr_tpu.models.edsr import EDSR

    ref_mod = load_reference_module("model.edsr")
    tm = ref_mod.EDSR(scale_factor=2)
    _randomize(tm, seed=8)
    # restore the frozen MeanShift convs the randomizer clobbered
    # (edsr.py:7-15: identity kernel, bias = sign * rgb_mean)
    with torch.no_grad():
        for shift in (tm.sub_mean, tm.add_mean):
            shift.weight.copy_(torch.eye(3).view(3, 3, 1, 1))
        tm.sub_mean.bias.copy_(-torch.tensor((0.4488, 0.4371, 0.4040)))
        tm.add_mean.bias.copy_(torch.tensor((0.4488, 0.4371, 0.4040)))
    x = rng.random((2, 3, 8, 16), dtype=np.float32)
    ref = _run_ref(tm, x)
    ours = EDSR(scale_factor=2).apply(ti.import_edsr(_sd(tm)), _nhwc(x), train=False)
    np.testing.assert_allclose(_nhwc(ref), np.asarray(ours), atol=3e-5)


@pytest.mark.parametrize("scale", [2, 4])
def test_reference_lapsrn(rng, scale):
    from tpgsr_tpu.models.lapsrn import LapSRN

    ref_mod = load_reference_module("model.lapsrn")
    tm = ref_mod.LapSRN(scale_factor=scale, in_planes=3, STN=False)
    _randomize(tm, seed=9)
    x = rng.random((2, 3, 8, 32), dtype=np.float32)
    ref = _run_ref(tm, x)
    ours = LapSRN(scale_factor=scale, in_planes=3, stn=False).apply(
        ti.import_lapsrn(_sd(tm), scale_factor=scale), _nhwc(x), train=False
    )
    np.testing.assert_allclose(_nhwc(ref), np.asarray(ours), atol=1e-5)


def test_reference_rrdbnet(rng):
    from tpgsr_tpu.models.rrdb import RRDBNet

    ref_mod = load_reference_module("model.esrgan")
    tm = ref_mod.RRDBNet(scale_factor=2, nb=2)
    _randomize(tm, seed=10)
    x = rng.random((2, 3, 8, 16), dtype=np.float32)
    ref = _run_ref(tm, x)
    ours = RRDBNet(scale_factor=2, nb=2).apply(
        ti.import_rrdbnet(_sd(tm)), _nhwc(x), train=False
    )
    np.testing.assert_allclose(_nhwc(ref), np.asarray(ours), atol=1e-5)


def test_reference_rrdb_tl_block(rng):
    """model/rrdb.py's RRDB_TL is broken at net level in the reference (the
    Sequential trunk feeds a tuple to the first block and a tensor to the
    rest), so the parity unit is one residual-in-residual TL block."""
    from tpgsr_tpu.models.rrdb import RRDB_TL

    ref_mod = load_reference_module("model.rrdb")
    tm = ref_mod.RRDB_TL(nf=16, gc=8)
    _randomize(tm, seed=11)
    x = rng.random((2, 16, 8, 16), dtype=np.float32)
    t = rng.random((2, 32, 8, 16), dtype=np.float32)
    tm.eval()
    with torch.no_grad():
        ref = tm((torch.from_numpy(x), torch.from_numpy(t))).numpy()
    ours = RRDB_TL(nf=16, gc=8).apply(
        ti.import_rrdb_tl_block(_sd(tm)), _nhwc(x), _nhwc(t)
    )
    np.testing.assert_allclose(_nhwc(ref), np.asarray(ours), atol=1e-5)
