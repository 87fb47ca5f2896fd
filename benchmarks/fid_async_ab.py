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

``--image_root`` switches the feed to a JPEG ImageFolder tree (the
production path the E2E run measured, where the host eigh dominates the
epoch tail). Folder runs re-decode per run (the RAM cache is
per-loader), so besides run walls the report carries STEADY epoch walls:
a timestamping logger records each epoch's record-flush time and the
median of the cache-warm diffs (epochs 2..4 in both modes — the async
flush shift keeps indices comparable) is the steady number.

Per-epoch FID curves are asserted identical across modes in-run.
"""

from __future__ import annotations

import argparse
import glob
import json
import statistics
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
    ap.add_argument("--image_root", default=None,
                    help="JPEG ImageFolder tree; switches the feed from "
                         "synthetic to the production folder path")
    ap.add_argument("--sweep_arm", action="store_true",
                    help="add a third interleaved arm: async scoring + "
                         "--fid_save_samples False (the FID-in-the-loop "
                         "sweep config; per-epoch FID still asserted "
                         "identical)")
    ap.add_argument("--out", default="FID_ASYNC_AB_r4.json")
    ap.add_argument("--toy", action="store_true",
                    help="toy widths on CPU — validates the harness "
                         "end-to-end without the chip")
    ns = ap.parse_args(argv)

    # host-idleness guard (VERDICT r4 #7): on this 1-CPU host a
    # concurrent heavy process invalidates interleaved A/Bs (ROUND4.md);
    # DMT_LOAD_LIMIT overrides the threshold if a stamped-but-contested
    # run is explicitly wanted.
    from benchmarks.hostcheck import host_idle_check
    idle = host_idle_check(refuse=True)

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
    from disentangle_mlp_tpu.utils.logger import Logger

    if ns.image_root:
        data_kw = dict(dataset="celebA", image_root_train=ns.image_root)
        ns.train_size = len(glob.glob(f"{ns.image_root}/*/*.jpg"))
        assert ns.train_size, f"no JPEGs under {ns.image_root}/*/"
    else:
        data_kw = dict(synthetic_data=True,
                       synthetic_train_size=ns.train_size)

    def cfg(name, epochs, **kw):
        return Config(
            name=name, beta=25.0, epochs=epochs,
            batch_size_train=16 if ns.toy else 256,
            n_samples=ns.n_samples,
            calc_fid=True, checkpoint_every=0,
            fid_path_pretrained=".e2e_runs/fid_async_stats.npz",
            save_path=".e2e_runs/%", log_path=".e2e_runs/%/log",
            **data_kw, **toy, **kw).finalize()

    # mode → (async scoring?, extra cfg). 'sweep' is the FID-in-the-loop
    # production config: async + --fid_save_samples False (score kept,
    # per-epoch sample PNGs dropped) — the config BO inner runs and
    # trajectory benches use.
    modes = {"async": (True, {}), "inline": (False, {})}
    if ns.sweep_arm:
        modes["sweep"] = (True, {"fid_save_samples": False})

    class TimedLogger(Logger):
        """Stamp each epoch record's flush time: diffs = epoch cadence
        (in async mode epoch N's record flushes as epoch N+1 lands, so
        diffs are the same steady walls shifted by one)."""

        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.stamps, self.records = [], []

        def log(self, results):
            super().log(results)
            self.stamps.append(time.perf_counter())
            self.records.append(dict(results))

    # one-off: stats from the training distribution + compile every
    # program (train step, Inception, normalize/u8) outside the windows
    c0 = cfg("fidab_warm", 1)
    train, _, _ = get_data_loader(c0)
    compute_dataset_statistics(train, ".e2e_runs/fid_async_stats.npz",
                               max_images=ns.stats_images)
    del train  # release its decode cache before the measured runs
    loop_mod._FID_ASYNC = True
    run_vaegan(c0)

    walls = {m: [] for m in modes}
    steady = {m: [] for m in modes}
    curves = {}
    for w in range(ns.windows):
        for mode, (is_async, extra) in modes.items():
            loop_mod._FID_ASYNC = is_async
            c = cfg(f"fidab_{mode}_{w}", ns.epochs, **extra)
            lg = TimedLogger(c.log_path, c)
            t0 = time.perf_counter()
            last = run_vaegan(c, logger=lg)
            walls[mode].append(time.perf_counter() - t0)
            diffs = [b - a for a, b in zip(lg.stamps, lg.stamps[1:])]
            # epochs 2..E-1 are cache-warm in BOTH modes at these indices
            # (async's one-record shift keeps them comparable); the first
            # diff carries the per-run re-decode, the async last diff is
            # the tiny final-resolve flush.
            if len(diffs) > 2:
                steady[mode].append(statistics.median(diffs[1:-1]))
            curve = [r["FID"] for r in lg.records]
            curves.setdefault(mode, curve)
            # same seeds + same math → the two modes must score
            # identically, epoch by epoch
            assert curve == curves[mode], (mode, curve, curves[mode])
            print(f"[window {w}] {mode}: "
                  f"{walls[mode][-1] / ns.epochs:.2f} s/epoch run-avg, "
                  f"steady {steady[mode][-1] if steady[mode] else None} "
                  f"(final FID {last['FID']:.3f})", flush=True)
    for m in modes:
        assert curves[m] == curves["async"], (m, curves)

    best = {m: min(vs) for m, vs in walls.items()}
    report = {
        "host_load": idle,
        "train_size": ns.train_size, "n_samples": ns.n_samples,
        "image_root": ns.image_root,
        "epochs_per_run": ns.epochs, "batch": 16 if ns.toy else 256,
        "epoch_wall_s": {k: [round(v / ns.epochs, 2) for v in vs]
                         for k, vs in walls.items()},
        "best_epoch_wall_s": {m: round(v / ns.epochs, 2)
                              for m, v in best.items()},
        "steady_epoch_wall_s": {k: [round(v, 2) for v in vs]
                                for k, vs in steady.items()},
        "best_steady_epoch_wall_s": {
            k: round(min(vs), 2) for k, vs in steady.items() if vs},
        "img_s_best": {m: round(ns.train_size * ns.epochs / v, 1)
                       for m, v in best.items()},
        "speedup": round(best["inline"] / best["async"], 2),
        "steady_speedup": (round(min(steady["inline"])
                                 / min(steady["async"]), 2)
                           if steady["async"] and steady["inline"]
                           else None),
        "sweep_steady_speedup": (round(min(steady["inline"])
                                       / min(steady["sweep"]), 2)
                                 if steady.get("sweep") and steady["inline"]
                                 else None),
        "fid_curve": curves["async"],
        "final_fid": curves["async"][-1],
        "note": "interleaved in-process windows, warm programs + stats; "
                "per-run wall includes model init, per-run folder "
                "re-decode, and the final epoch's non-overlappable FID "
                "resolve; steady walls are cache-warm epoch medians from "
                "the record-flush stamps; full FID-curve equality "
                "asserted in-run across modes",
    }
    with open(ns.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["best_epoch_wall_s"]
                     | {"speedup": report["speedup"],
                        "steady": report["best_steady_epoch_wall_s"],
                        "steady_speedup": report["steady_speedup"],
                        "sweep_steady_speedup":
                            report["sweep_steady_speedup"]}))
    print(f"report → {ns.out}")


if __name__ == "__main__":
    main()
