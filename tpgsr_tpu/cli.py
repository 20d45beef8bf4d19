"""``python -m tpgsr_tpu.cli`` — same CLI as the repo-root ``main.py``
(reference flag surface, main.py:22-52)."""

from tpgsr_tpu.config import AttrDict, build_arg_parser, load_config, tpg_opt
from tpgsr_tpu.train.trainer import TextSR


def main(argv=None) -> None:
    ns = build_arg_parser().parse_args(argv)
    args = AttrDict(vars(ns))
    config = load_config(args["config"])
    mission = TextSR(config, args, tpg_opt())
    if args.get("test"):
        mission.test()
    elif args.get("demo"):
        mission.demo()
    else:
        mission.train()


if __name__ == "__main__":
    main()
