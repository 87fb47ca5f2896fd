"""A/B: async vs inline per-epoch FID scoring, full production config.

Round 4 follow-up to E2E_FOLDER_r4.json, which showed steady-state epochs
on real folder data dominated by the per-epoch FID's HOST work — the f64
Fréchet eigen math (np.cov ~4 s + eigh(2048) ~7-11 s on this 1-CPU host at
n_samples=2048, the full-stats path) plus n_samples PNG encodes — while
the chip sat idle. train/loop.py now runs that host work on a background
worker overlapped with the next epoch's device steps (DMT_ASYNC_FID).

This harness measures both modes in-process with interleaved windows (the
only valid comparison on the drifting tunneled chip — README_PERF), full
β-VAE-GAN width, synthetic data, self-built stats:

    python -m benchmarks.fid_async_ab --out FID_ASYNC_AB_r4.json

Per-epoch FID values are asserted identical across modes in-run.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_size", type=int, default=32768)
    ap.add_argument("--stats_images", type=int, default=4096)
    ap.add_argument("--n_samples", type=int, default=2048,
                    help="2048 = pool3 dim → the slow full-stats host path "
                         "(the E2E_FOLDER_r4 configuration)")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--windows", type=int, default=2)
    ap.add_argument("--out", default="FID_ASYNC_AB_r4.json")
    ap.add_argument("--toy", action="store_true",
                    help="toy widths on CPU — validates the harness "
                         "end-to-end without the chip")
    ns = ap.parse_args(argv)

    toy = {}
    if ns.toy:
        import jax
        jax.config.update("jax_platforms", "cpu")
        ns.train_size, ns.stats_images, ns.n_samples = 64, 32, 8
        toy = dict(n_hidden=8, img_size=32,
                   n_z=[8, 4, 4], representation_size=4, head_width=32,
                   decoder_channels=[8, 8, 8], disc_channels=[4, 8, 8, 8],
                   disc_feature_dim=32, dtype="float32")

    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    import disentangle_mlp_tpu.train.loop as loop_mod
    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.data.pipeline import get_data_loader
    from disentangle_mlp_tpu.eval.fid import compute_dataset_statistics
    from disentangle_mlp_tpu.train.loop import run_vaegan

    def cfg(name, epochs):
        return Config(
            name=name, beta=25.0, epochs=epochs,
            synthetic_data=True, synthetic_train_size=ns.train_size,
            batch_size_train=16 if ns.toy else 256,
            n_samples=ns.n_samples,
            calc_fid=True, checkpoint_every=0,
            fid_path_pretrained=".e2e_runs/fid_async_stats.npz",
            save_path=".e2e_runs/%", log_path=".e2e_runs/%/log",
            **toy).finalize()

    # one-off: stats from the same synthetic distribution + compile every
    # program (train step, Inception, normalize/u8) outside the windows
    c0 = cfg("fidab_warm", 1)
    train, _, _ = get_data_loader(c0)
    compute_dataset_statistics(train, ".e2e_runs/fid_async_stats.npz",
                               max_images=ns.stats_images)
    loop_mod._FID_ASYNC = True
    run_vaegan(c0)

    walls = {"async": [], "inline": []}
    fids = {}
    for w in range(ns.windows):
        for mode in ("async", "inline"):
            loop_mod._FID_ASYNC = mode == "async"
            t0 = time.perf_counter()
            last = run_vaegan(cfg(f"fidab_{mode}_{w}", ns.epochs))
            walls[mode].append(time.perf_counter() - t0)
            fids.setdefault(mode, last["FID"])
            print(f"[window {w}] {mode}: "
                  f"{walls[mode][-1] / ns.epochs:.2f} s/epoch "
                  f"(final FID {last['FID']:.3f})", flush=True)
    # same seeds + same math → the two modes must score identically
    assert abs(fids["async"] - fids["inline"]) < 1e-9, fids

    best_a, best_i = min(walls["async"]), min(walls["inline"])
    report = {
        "train_size": ns.train_size, "n_samples": ns.n_samples,
        "epochs_per_run": ns.epochs, "batch": 16 if ns.toy else 256,
        "epoch_wall_s": {k: [round(v / ns.epochs, 2) for v in vs]
                         for k, vs in walls.items()},
        "best_epoch_wall_s": {"async": round(best_a / ns.epochs, 2),
                              "inline": round(best_i / ns.epochs, 2)},
        "img_s_best": {
            "async": round(ns.train_size * ns.epochs / best_a, 1),
            "inline": round(ns.train_size * ns.epochs / best_i, 1)},
        "speedup": round(best_i / best_a, 2),
        "final_fid": fids["async"],
        "note": "interleaved in-process windows, warm programs + stats; "
                "per-run wall includes model init and the final epoch's "
                "non-overlappable FID resolve; FID equality asserted "
                "in-run across modes",
    }
    with open(ns.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["best_epoch_wall_s"]
                     | {"speedup": report["speedup"]}))
    print(f"report → {ns.out}")


if __name__ == "__main__":
    main()
