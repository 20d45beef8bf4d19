"""Shared text-prior (InfoGen) pyramid with per-backbone padding variants.

The reference carries near-identical copies of ``InfoGen`` per backbone that
differ only in ConvTranspose paddings:
  * TSRN   (model/tsrn.py:81-108):    paddings (1,1),(1,1),(1,1),(1,0)
  * SRCNN/SRResNet/RDN/VDSR (model/srcnn.py:18-47, srresnet.py:166-195,
    rdn.py:93-120, vdsr.py:92-119):   paddings (0,0),(0,0),(1,1),(1,1)
"""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from tpgsr_tpu.models.layers import BatchNorm, TorchConvTranspose

TSRN_PADDINGS = ((1, 1), (1, 1), (1, 1), (1, 0))
NP_PADDINGS = ((0, 0), (0, 0), (1, 1), (1, 1))


class InfoGenP(nn.Module):
    """37-class prior [B,1,T,C] -> spatial text map via 4x deconv+BN+ReLU."""

    t_emb: int
    output_size: int
    paddings: Tuple[Tuple[int, int], ...] = TSRN_PADDINGS

    @nn.compact
    def __call__(self, t_embedding, train: bool = True):
        feats = (512, 128, 64, self.output_size)
        strides = ((2, 2), (2, 2), (2, 2), (2, 1))
        x = t_embedding
        for i, (f, s, p) in enumerate(zip(feats, strides, self.paddings), start=1):
            x = TorchConvTranspose(f, (3, 3), s, padding=p, use_bias=False, name=f"tconv{i}")(x)
            x = nn.relu(BatchNorm(name=f"bn{i}")(x, use_running_average=not train))
        return x
