"""Training CLI — the reference's three experiment scripts behind one flag.

    python -m disentangle_mlp_tpu.cli.train --model betavaegan \
        --name beta25 --beta 25 [EnvSetter flags...]

replaces ``python new_{vae,gan,betavaegan}.py ...`` (reference:
experiments/*.py) with the identical flag surface (see config.py), output
directory tree, JSON log schema, and checkpoint/eval semantics.
"""

from __future__ import annotations

from ..config import Config, build_arg_parser
from ..train.loop import FAMILY_DATASETS, RUNNERS, run_family


def main(argv=None) -> None:
    parser = build_arg_parser("disentangle_mlp_tpu trainer")
    parser.add_argument("--model", type=str, default="betavaegan",
                        choices=sorted(RUNNERS.keys()))
    ns = parser.parse_args(argv)
    model = ns.model
    kwargs = {k: v for k, v in vars(ns).items() if k != "model"}
    cfg = Config(**kwargs).finalize()
    runner = run_family if cfg.dataset in FAMILY_DATASETS else RUNNERS[model]

    from ..utils.runtime import setup, teardown
    setup(cfg.profile_dir)
    try:
        runner(cfg)
    finally:
        teardown(cfg.profile_dir)


if __name__ == "__main__":
    main()
