"""--arch dispatch table (mirrors interfaces/base.py:293-370 generator_init).

Each entry: model constructor (from config/args), the image criterion kind,
the number of input channels the trainer feeds (srcnn/rdn/vdsr take 3,
super_resolution.py:409-415), and whether the arch consumes a text prior.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from tpgsr_tpu.models.bicubic import BICUBIC
from tpgsr_tpu.models.edsr import EDSR
from tpgsr_tpu.models.lapsrn import LapSRN
from tpgsr_tpu.models.rdn import RDN, RDN_TL
from tpgsr_tpu.models.rrdb import RRDBNet, RRDBNet_TL
from tpgsr_tpu.models.srcnn import SRCNN, SRCNN_TL
from tpgsr_tpu.models.srresnet import SRResNet, SRResNet_TL
from tpgsr_tpu.models.tsrn import SEM_TSRN, TSRN, TSRN_C2F, TSRN_TL

# archs run through the cascade/distill training path
# (super_resolution.py:44 ABLATION_SET)
ABLATION_SET = ("tsrn_tl_cascade", "srcnn_tl", "srresnet_tl", "rdn_tl", "vdsr_tl")
# archs whose trainer path uses a single student TPG without cascade
TL_SIMPLE = ("tsrn_tl", "tsrn_tl_wmask", "esrgan_tl")
TL_ARCHS = ABLATION_SET + TL_SIMPLE


@dataclass(frozen=True)
class ArchSpec:
    build: Callable  # (cfg-like kwargs) -> nn.Module or callable
    crit: str  # 'image' | 'mse' | 'l1' | 'charbonnier'
    in_channels: int  # channels the trainer slices from the input
    uses_prior: bool
    trainable: bool = True


def _tsrn(args, cfg):
    return TSRN(
        scale_factor=cfg["scale_factor"], width=cfg["width"], height=cfg["height"],
        stn=args["STN"], mask=args["mask"], srb_nums=args["srb"], hidden_units=args["hd_u"],
    )


def _tsrn_tl(args, cfg):
    return TSRN_TL(
        scale_factor=cfg["scale_factor"], width=cfg["width"], height=cfg["height"],
        stn=args["STN"], mask=args["mask"], srb_nums=args["srb"], hidden_units=args["hd_u"],
    )


ARCHS = {
    "tsrn": ArchSpec(_tsrn, "image", 4, False),
    "tsrn_tl": ArchSpec(_tsrn_tl, "image", 4, True),
    "tsrn_tl_wmask": ArchSpec(_tsrn_tl, "image", 4, True),
    "tsrn_tl_cascade": ArchSpec(_tsrn_tl, "image", 4, True),
    "bicubic": ArchSpec(lambda a, c: BICUBIC(scale_factor=c["scale_factor"]), "mse", 4, False, trainable=False),
    "srcnn": ArchSpec(
        lambda a, c: SRCNN(c["scale_factor"], 3, a["STN"], c["height"], c["width"]), "mse", 3, False
    ),
    "vdsr": ArchSpec(lambda a, c: VDSRWrap(c), "mse", 3, False),
    "srres": ArchSpec(
        lambda a, c: SRResNet(c["scale_factor"], a["STN"], c["width"], c["height"], a["mask"]),
        "mse", 4, False,
    ),
    "esrgan": ArchSpec(lambda a, c: RRDBNet(c["scale_factor"]), "l1", 3, False),
    "rdn": ArchSpec(lambda a, c: RDN(scale_factor=c["scale_factor"]), "l1", 3, False),
    "edsr": ArchSpec(lambda a, c: EDSR(c["scale_factor"]), "l1", 3, False),
    "lapsrn": ArchSpec(
        lambda a, c: LapSRN(c["scale_factor"], 3, a["STN"], c["width"], c["height"]),
        "charbonnier", 3, False,
    ),
    "srcnn_tl": ArchSpec(
        lambda a, c: SRCNN_TL(c["scale_factor"], 4, a["STN"], c["height"], c["width"]),
        "mse", 4, True,
    ),
    "srresnet_tl": ArchSpec(
        lambda a, c: SRResNet_TL(c["scale_factor"], a["STN"], c["width"], c["height"], a["mask"]),
        "mse", 4, True,
    ),
    "rdn_tl": ArchSpec(lambda a, c: RDN_TL(scale_factor=c["scale_factor"]), "l1", 4, True),
    "vdsr_tl": ArchSpec(
        lambda a, c: VDSR_TLWrap(c), "mse", 4, True
    ),
    # experimental archs present in the reference code but not its CLI
    # (model/tsrn.py:218-370, model/rrdb.py:131-160)
    "tsrn_c2f": ArchSpec(
        lambda a, c: TSRN_C2F(
            scale_factor=c["scale_factor"], width=c["width"], height=c["height"],
            stn=a["STN"], mask=a["mask"], srb_nums=a["srb"], hidden_units=a["hd_u"],
        ), "image", 4, False,
    ),
    "sem_tsrn": ArchSpec(
        lambda a, c: SEM_TSRN(
            scale_factor=c["scale_factor"], width=c["width"], height=c["height"],
            stn=a["STN"], mask=a["mask"], srb_nums=a["srb"], hidden_units=a["hd_u"],
        ), "image", 4, False,
    ),
    "esrgan_tl": ArchSpec(lambda a, c: RRDBNet_TL(c["scale_factor"]), "l1", 3, True),
    # model/net.py's TextZoom net, to its INTENDED semantics: the file is
    # dead-on-arrival in the reference (model/net.py:15 imports a
    # nonexistent `AttentionalImageLoss` -> ImportError), but the class it
    # meant to define (net.py:18-68) is structurally TSRN with a plain
    # 3-channel input, 6 recurrent residual blocks, and 64 channels — its
    # RecurrentResidualBlock/GruBlock/UpsampleBLock/mish bodies
    # (net.py:71-137) are line-identical to tsrn.py:373-508 — so it is
    # exposed as exactly that configuration of our TSRN.
    "textzoom_net": ArchSpec(
        lambda a, c: TSRN(
            scale_factor=c["scale_factor"], width=c["width"], height=c["height"],
            stn=a["STN"], mask=False, srb_nums=6, hidden_units=32,
        ),
        "image", 3, False,
    ),
}


def VDSRWrap(c):
    from tpgsr_tpu.models.vdsr import VDSR

    return VDSR(scale_factor=c["scale_factor"], in_planes=3)


def VDSR_TLWrap(c):
    from tpgsr_tpu.models.vdsr import VDSR_TL

    return VDSR_TL(
        scale_factor=c["scale_factor"], in_planes=4, height=c["height"], width=c["width"]
    )


def build_model(arch: str, args: dict, cfg: dict):
    spec = ARCHS[arch]
    return spec.build(args, cfg), spec
