"""FID reference-statistics builder.

The reference depends on a precomputed ``fid_stats_celeba.npz``
(μ, Σ of Inception pool3 activations over the real dataset;
reference: envsetter.py:25, fid.py:287-290) whose construction lives
outside the repo. This CLI closes that gap: it streams an image folder
through the on-device InceptionV3 and writes the ``.npz``:

    python -m disentangle_mlp_tpu.cli.stats --name stats \
        --image_root_train /data/celebA/train \
        --stats_out fid_stats_celeba.npz --max_images 50000

The resulting file is what ``--fid_path_pretrained`` consumes. A
real-vs-real sanity check (reference report §5.1: 50k real images vs the
full-dataset stats ≈ 2) can be run by scoring a held-out directory against
the produced stats via eval/fid.get_fid.
"""

from __future__ import annotations

from ..config import Config, build_arg_parser


def main(argv=None) -> None:
    parser = build_arg_parser("FID reference statistics builder")
    parser.add_argument("--stats_out", type=str, default="fid_stats.npz")
    parser.add_argument("--max_images", type=int, default=50000)
    ns = parser.parse_args(argv)
    extra = {k: vars(ns).pop(k) for k in ["stats_out", "max_images"]}
    cfg = Config(**vars(ns)).finalize()

    from ..utils.runtime import setup
    setup()

    from ..data.pipeline import get_data_loader
    from ..eval.fid import compute_dataset_statistics, inception_is_pretrained

    train, _, _ = get_data_loader(cfg)
    if not inception_is_pretrained():
        print("WARNING: no pretrained FID Inception weights found "
              "(see eval/inception.py WEIGHT_SEARCH_PATHS); statistics will "
              "be self-consistent but not comparable to published FIDs.")
    mu, sigma = compute_dataset_statistics(
        train, path_out=extra["stats_out"], max_images=extra["max_images"])
    print(f"wrote {extra['stats_out']}: mu{mu.shape} sigma{sigma.shape}")


if __name__ == "__main__":
    main()
