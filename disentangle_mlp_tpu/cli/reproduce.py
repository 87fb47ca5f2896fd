"""CLI for the β=25 FID reproduction harness (eval/reproduce.py).

    dmt-reproduce --name repro --image_root_train ... --image_root_val ...

Defaults pin the reference's published configuration: β=25, 10 epochs,
batch 256, lr 3e-4, 1000 FID samples (results/logs/log_beta_vaegan_25.json
``args``). ``--synthetic_data True`` runs the identical plumbing on the
synthetic dataset with self-built statistics (no assets needed)."""

from __future__ import annotations

from ..config import Config, build_arg_parser


def main(argv=None) -> None:
    parser = build_arg_parser("beta=25 FID reproduction harness")
    parser.add_argument("--stats_out", type=str, default="fid_stats_repro.npz")
    parser.add_argument("--stats_images", type=int, default=50000)
    parser.add_argument("--calib_images", type=int, default=50000)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--report_out", type=str, default="REPRODUCTION.json")
    parser.set_defaults(beta=25.0, epochs=10)
    ns = parser.parse_args(argv)
    extra = {k: vars(ns).pop(k) for k in
             ["stats_out", "stats_images", "calib_images", "skip_train",
              "report_out"]}
    cfg = Config(**vars(ns)).finalize()

    from ..utils.runtime import setup
    setup(cfg.profile_dir)

    from ..eval.reproduce import run_reproduction
    run_reproduction(cfg, extra["stats_out"],
                     stats_images=extra["stats_images"],
                     calib_images=extra["calib_images"],
                     skip_train=extra["skip_train"],
                     report_out=extra["report_out"])


if __name__ == "__main__":
    main()
