"""Offline eval CLI — checkpoint sweep producing FID / reconstructions /
samples. Parity with utils/generate_samples_recons.py (reference: :36-56):

    python -m disentangle_mlp_tpu.cli.evaluate --model betavaegan \
        --name eval --load_path m1 m2 --test_recons True --test_samples True
"""

from __future__ import annotations

from ..config import Config, build_arg_parser
from ..train.loop import RUNNERS


def main(argv=None) -> None:
    parser = build_arg_parser("disentangle_mlp_tpu offline eval")
    parser.add_argument("--model", type=str, default="betavaegan",
                        choices=sorted(RUNNERS.keys()))
    ns = parser.parse_args(argv)
    model = ns.model
    kwargs = {k: v for k, v in vars(ns).items() if k != "model"}
    kwargs["to_train"] = False  # sweep only
    cfg = Config(**kwargs).finalize()
    if cfg.dataset in ("birds", "mnist"):
        # the celebA experiment runners would unpack the families' None
        # val/test loaders (reference get_data_loader returns train-only
        # for these, dataset.py:23-35; its offline eval is celebA-only)
        raise SystemExit(
            f"offline eval sweeps are celebA-only (the reference's "
            f"generate_samples_recons.py instantiates the celebA models); "
            f"--dataset {cfg.dataset} checkpoints resume via "
            f"dmt-train --load_path instead")

    from ..utils.runtime import setup
    setup()
    RUNNERS[model](cfg)


if __name__ == "__main__":
    main()
