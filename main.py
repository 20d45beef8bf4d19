#!/usr/bin/env python3
"""CLI entry — same flag surface as the reference's main.py:10-76, so the
upstream ``train_TPGSR-*.sh`` / ``test.sh`` one-liners run unchanged against
the TPU-native framework."""

from tpgsr_tpu.config import build_arg_parser, load_config, tpg_opt
from tpgsr_tpu.config import AttrDict
from tpgsr_tpu.train.trainer import TextSR


def main(config, args, opt_TPG=None):
    mission = TextSR(config, args, opt_TPG)
    if args.get("test"):
        mission.test()
    elif args.get("demo"):
        mission.demo()
    else:
        mission.train()


if __name__ == "__main__":
    parser = build_arg_parser()
    ns = parser.parse_args()
    args = AttrDict(vars(ns))
    config = load_config(args["config"])
    main(config, args, opt_TPG=tpg_opt())
