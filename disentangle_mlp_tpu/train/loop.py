"""Epoch-level experiment driver.

The three reference training scripts (experiments/new_vae.py, new_gan.py,
new_betavaegan.py) share one skeleton: wire config→logger→data→model→optim,
then per epoch: train over batches → checkpoint → optional FID over 1000
generated samples → JSON log; afterwards an optional eval sweep over
``--load_path`` checkpoints (reconstructions / samples / FID). This module
is that skeleton, once, for all three experiments — the per-batch math
lives in the jitted step functions.

Per-epoch FID is scored ASYNCHRONOUSLY (round 4): device work happens at
epoch end, but the host-side Fréchet eigen math and sample-PNG encodes run
on a background worker, and the epoch's console line + JSON record are
emitted when the NEXT epoch ends (the last at loop exit). Record contents
and order are unchanged; DMT_ASYNC_FID=0 restores inline scoring.

Logged keys per experiment match the reference logs exactly
(results/logs/*.json; SURVEY.md §5):
  vae:        {Epoch, Avg Loss, FID}
  gan:        {Epoch, Avg Loss G, Avg Loss E, FID}
  betavaegan: {Epoch, Avg Eec Loss, Avg Dnc Loss, Avg Dis Loss, FID}
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Optional

import jax

from ..config import Config
from ..data.pipeline import get_data_loader
from ..eval.samples import gen_reconstructions, generate_fid_samples, generate_samples
from ..parallel.mesh import (batch_sharding, make_mesh,
                             maybe_initialize_distributed, replicate)
from ..utils.checkpoint import AsyncCheckpointer, load_checkpoint
from ..utils.logger import Logger
from .gan import create_gan_experiment
from .vae import create_vae_experiment
from .vaegan import create_vaegan_experiment


def _setup_parallel(cfg: Config, devices=None):
    """Data-parallel mesh over all chips (SURVEY.md §2.2's TPU-native plan):
    params replicated, train batch sharded along axis 0. Returns
    (mesh, train_batch_sharding) — or (None, None) when the batch doesn't
    divide the device count (e.g. tiny smoke runs).

    ``devices`` restricts the run to an explicit chip group (the parallel-β
    BO search runs one experiment per group, bo/driver.py); an explicit
    group always gets a mesh — even a 1-device one — so every array of the
    run is pinned to the group's chips rather than the process default.

    A batch that doesn't divide the devices is only tolerated for the
    implicit single-host case (tiny smoke runs fall back to unsharded
    execution); with an explicit group it would silently unpin the run
    onto the default device, and on a multi-host pod every host would
    train an unsynchronized partial batch — both are errors."""
    maybe_initialize_distributed()
    mesh = make_mesh(cfg.mesh_shape, devices=devices)
    n = mesh.devices.size
    if cfg.batch_size_train % n != 0:
        if devices is not None:
            raise ValueError(
                f"batch_size_train={cfg.batch_size_train} must divide the "
                f"explicit {n}-device group")
        if jax.process_count() > 1:
            raise ValueError(
                f"multi-host run: batch_size_train={cfg.batch_size_train} "
                f"must divide the {n} global devices")
        return None, None
    if n <= 1 and devices is None:
        return None, None
    return mesh, batch_sharding(mesh)



def _ckpt_due(cfg: Config, epoch: int) -> bool:
    """Per-epoch checkpointing is the reference cadence
    (new_betavaegan.py:222-228); --checkpoint_every N thins it (0 = never)
    for sweeps that don't need resume — the full-size ~1.3 GB save can
    dominate wall time over a slow host link. The FINAL epoch always saves
    (when saving is enabled at all): the fully-trained weights of a long
    run must never exist only in process memory."""
    every = getattr(cfg, "checkpoint_every", 1)
    return bool(every) and ((epoch + 1) % every == 0
                            or epoch + 1 == cfg.epochs)


class Throughput:
    """images/sec meter — the north-star perf metric (BASELINE.json).
    The first ``warmup`` batches (XLA compilation) are excluded, and the
    loops pause() the clock around non-train work (FID scoring, checkpoint
    writes) so the logged rate measures the same thing bench.py does."""

    def __init__(self, warmup: int = 1):
        self.images = 0
        self.batches = 0
        self.warmup = warmup
        self.start = None
        self._excluded = 0.0
        self._paused_at = None

    def add(self, n: int):
        self.batches += 1
        if self.batches <= self.warmup:
            self.start = time.perf_counter()
            return
        self.images += n

    def pause(self):
        if self.start is not None and self._paused_at is None:
            self._paused_at = time.perf_counter()

    def resume(self):
        if self._paused_at is not None:
            self._excluded += time.perf_counter() - self._paused_at
            self._paused_at = None

    def rate(self) -> float:
        if self.start is None:
            return 0.0
        end = (time.perf_counter() if self._paused_at is None
               else self._paused_at)
        dt = end - self.start - self._excluded
        return self.images / dt if dt > 0 else 0.0


def _maybe_fid(cfg: Config, decode_fn: Callable, epoch: int, path: str,
               devices=None):
    """FID over cfg.n_samples generated samples vs the precomputed stats
    (reference: new_betavaegan.py:230-235). Returns 'N/A' when disabled or
    when the reference-statistics asset is absent/unreadable — ONLY those
    conditions; a programming error in the FID stack re-raises (round-1
    review: the bare except hid real bugs behind 'N/A')."""
    if not cfg.calc_fid:
        return "N/A"
    from ..eval.fid import ASSET_ERRORS, get_fid_from_samples

    try:
        samples = generate_fid_samples(
            decode_fn, epoch, cfg.n_samples, cfg.n_hidden, path,
            rng_seed=cfg.seed + epoch, save=cfg.fid_save_samples)
        return get_fid_from_samples(samples, cfg.fid_path_pretrained,
                                    devices=devices)
    except ASSET_ERRORS as e:
        # missing/unreadable/corrupt asset must not kill training
        print(f"[fid] skipped: {e}")
        return "N/A"


# Per-epoch FID's host-side work — the d×d (or n×n) float64 eigen math and
# n_samples PNG encodes — runs on this single background worker so it
# overlaps the NEXT epoch's device steps. At full size the host eigh alone
# rivals an epoch's train wall on this 1-CPU host (E2E_FOLDER_r4.json:
# ~11 s of Fréchet math vs ~5 s of training per 20k-image epoch), so the
# overlap roughly halves steady-state epoch wall time. One worker: the
# host has one CPU, and FIFO order keeps per-epoch scores resolving in
# submission order. DMT_ASYNC_FID=0 restores inline scoring.
_FID_ASYNC = os.environ.get("DMT_ASYNC_FID", "1") != "0"
_FID_POOL: Optional[ThreadPoolExecutor] = None


def _instant_na():
    """A resolve() that is already 'N/A' (FID disabled, or the stats asset
    absent). Tagged so _EpochEmitter needn't defer its epoch record — there
    is no background work to overlap."""
    fn = lambda: "N/A"  # noqa: E731
    fn.instant = True
    return fn


def _fid_pool() -> ThreadPoolExecutor:
    global _FID_POOL
    if _FID_POOL is None:
        _FID_POOL = ThreadPoolExecutor(max_workers=1,
                                       thread_name_prefix="dmt-fid")
    return _FID_POOL


def _maybe_fid_async(cfg: Config, decode_fn: Callable, epoch: int,
                     path: str, devices=None) -> Callable[[], object]:
    """Async twin of :func:`_maybe_fid` for the train loops: returns a
    zero-arg ``resolve()`` → float | 'N/A'. Device work (decode, per-image
    normalize, pool3 extraction, uint8 quantize) runs NOW in the caller's
    thread — ``decode_fn`` closes over live train state, and interleaving
    a second program stream into the chip's step pipeline would add
    jitter. Only host work is deferred: the PNG pull+encodes and the
    Fréchet eigen math. Error contract unchanged (ASSET_ERRORS → 'N/A',
    printed; programming errors re-raise — from resolve() when they arise
    in the deferred half)."""
    if not cfg.calc_fid:
        return _instant_na()
    from ..eval import fid as fid_mod
    from ..eval.samples import _sample_latents, write_sample_files

    try:
        m2, s2 = fid_mod._handle_path(cfg.fid_path_pretrained)
        z = _sample_latents(cfg.seed + epoch, cfg.n_samples, cfg.n_hidden)
        dev = decode_fn(z)
        acts = fid_mod.get_activations(
            fid_mod.per_image_normalize(dev), devices=devices)
        # device compute only; pulled in the job (skipped entirely when
        # --fid_save_samples False: no quantize program, no 25 MB pull)
        u8 = fid_mod.normalized_u8(dev) if cfg.fid_save_samples else None
    except fid_mod.ASSET_ERRORS as e:
        print(f"[fid] skipped: {e}")
        return _instant_na()

    def job():
        # PNG files first (the sync path wrote them before scoring, so an
        # unwritable samples dir degrades to 'N/A' before any FID exists)
        if u8 is not None:
            write_sample_files(u8, epoch, path)
        # full-stats path only: √Σ₂ is memoized on the stats file, so the
        # first epoch pays one extra eigh here (on the worker, off the
        # epoch's critical path) and every later epoch skips the eigh of
        # Σ₁ entirely (eval/fid.py cached_sqrt_sigma2)
        sqrt2 = (fid_mod.cached_sqrt_sigma2(cfg.fid_path_pretrained, s2)
                 if acts.shape[0] >= fid_mod.FEATURE_DIM else None)
        return fid_mod.frechet_from_acts(acts, m2, s2, sqrt_sigma2=sqrt2)

    future = _fid_pool().submit(job)

    def resolve():
        try:
            return future.result()
        except fid_mod.ASSET_ERRORS as e:
            print(f"[fid] skipped: {e}")
            return "N/A"

    return resolve


class _EpochEmitter:
    """Defers each epoch's console line + JSON record until its FID
    resolves — one epoch later in async mode (finish() flushes the last),
    so the background Fréchet/PNG work overlaps the following epoch's
    training. Values and record order are identical to inline emission;
    only console TIMING shifts (epoch N's ``====>`` line prints at epoch
    N+1's end). ``line`` is fully pre-formatted except the ``{fid}`` slot
    — rates/losses are captured at epoch end, not at flush time."""

    def __init__(self, logger: Logger, deferred: Optional[bool] = None):
        self.logger = logger
        self.deferred = _FID_ASYNC if deferred is None else deferred
        self._pending = None
        self.last: Dict = {}

    def emit(self, resolve: Callable[[], object],
             record_fn: Callable[[object], Dict], line: str,
             last_fn: Optional[Callable[[Dict], Dict]] = None):
        item = (resolve, record_fn, line, last_fn)
        # instant resolves (FID off / asset absent) emit inline — UNLESS an
        # earlier epoch is still pending, which must flush first to keep
        # log records in epoch order (the asset can appear mid-run)
        if not self.deferred or (getattr(resolve, "instant", False)
                                 and self._pending is None):
            self._flush(item)
            return
        prev, self._pending = self._pending, item
        if prev is not None:
            self._flush(prev)

    def _flush(self, item):
        resolve, record_fn, line, last_fn = item
        fid = resolve()
        rec = record_fn(fid)
        print(line.format(fid=fid))
        self.logger.log(rec)
        self.last = last_fn(rec) if last_fn else \
            {k: v for k, v in rec.items() if k != "Epoch"}

    def finish(self) -> Dict:
        if self._pending is not None:
            prev, self._pending = self._pending, None
            self._flush(prev)
        return dict(self.last)


def run_vae(cfg: Config, logger: Optional[Logger] = None) -> Dict:
    """Parity with experiments/new_vae.py __main__ (:78-128)."""
    logger = logger or Logger(cfg.log_path, cfg)
    rng = jax.random.key(cfg.seed)
    exp = create_vae_experiment(cfg, rng)
    mesh, train_sharding = _setup_parallel(cfg)
    if mesh is not None:
        exp.state = replicate(exp.state, mesh)
    train_loader, _, test_loader = get_data_loader(cfg, sharding=train_sharding)
    if cfg.to_train:
        # decode the epoch-1 order into the RAM cache while the first
        # step's 4-7 min XLA compile blocks (VERDICT r3 #5); no-op for
        # cacheless sources. DMT_DECODE_WARMUP=0 disables for A/B.
        train_loader.start_cache_warmup()

    def decode_fn(z):
        return exp.decode(exp.state, z)

    start_epoch = 0
    if cfg.load_path and len(cfg.load_path) < 2:
        start_epoch, states = load_checkpoint(
            cfg.load_path[0], {"model": exp.state})
        exp.state = states["model"]
        if mesh is not None:  # restored host arrays: back onto the mesh
            exp.state = replicate(exp.state, mesh)
    elif cfg.load_path and len(cfg.load_path) > 1 and cfg.to_train:
        # the reference silently trains FROM SCRATCH here (new_vae.py:79-80
        # loads nothing for ≥2 paths), clobbering the listed checkpoints'
        # run tree — same hardening as run_gan
        raise ValueError("Cannot load more than one model for training")

    meter = Throughput()
    ckpt = AsyncCheckpointer(
        opt_state_dtype=getattr(cfg, "checkpoint_save_dtype", None))
    emitter = _EpochEmitter(logger)
    if cfg.to_train:
        for epoch in range(start_epoch, cfg.epochs):
            meter.resume()
            step_rng = jax.random.fold_in(rng, epoch)
            # metrics accumulate ON DEVICE; fetching them per step would
            # force a host sync every batch (expensive over a TPU tunnel).
            # Only the sparse log_interval print fetches mid-epoch.
            total_loss = None
            for i, (x, _) in enumerate(train_loader):
                exp.state, m = exp.train_step(
                    exp.state, x, jax.random.fold_in(step_rng, i))
                total_loss = m["loss"] if total_loss is None \
                    else total_loss + m["loss"]
                meter.add(x.shape[0])
                if i % cfg.log_interval == 0:
                    print(f"Train Epoch: {epoch} [{i}/{len(train_loader)}] "
                          f"Loss: {float(m['loss']) / x.shape[0]:.6f}")
            avg_loss = float(total_loss) / train_loader.dataset_size
            meter.pause()  # FID/checkpoint wall time is not train time
            if _ckpt_due(cfg, epoch):
                ckpt.save(f"{cfg.model_path}/model_{epoch + 1}", epoch + 1,
                          {"model": exp.state},
                          rotate_keep=cfg.keep_checkpoints)
            emitter.emit(
                _maybe_fid_async(cfg, decode_fn, epoch, cfg.fid_path_samples),
                lambda fid, e=epoch, a=avg_loss: {
                    "Epoch": e, "Avg Loss": a, "FID": fid},
                f"====> Epoch: {epoch} Average loss: {avg_loss:.4f} "
                f"FID: {{fid}} ({meter.rate():.1f} img/s)")
    last = emitter.finish()

    ckpt.wait()
    _eval_sweep(cfg, {"model": exp.state}, decode_fn,
                lambda x: exp.reconstruct(exp.state, x, rng), test_loader,
                assign=lambda s: setattr(exp, "state", s["model"]))
    last["images_per_sec"] = meter.rate()
    return last


def run_gan(cfg: Config, logger: Optional[Logger] = None) -> Dict:
    """Parity with experiments/new_gan.py __main__ (:154-211). The logged
    'Avg Loss E' key is preserved; unlike the reference (new_gan.py:138-139
    overwrites the D loss with G's — a logging bug) it holds the true
    average D loss."""
    logger = logger or Logger(cfg.log_path, cfg)
    rng = jax.random.key(cfg.seed)
    exp = create_gan_experiment(cfg, rng)
    mesh, train_sharding = _setup_parallel(cfg)
    if mesh is not None:
        exp.g_state = replicate(exp.g_state, mesh)
        exp.d_state = replicate(exp.d_state, mesh)
    train_loader, _, test_loader = get_data_loader(cfg, sharding=train_sharding)
    if cfg.to_train:
        # decode the epoch-1 order into the RAM cache while the first
        # step's 4-7 min XLA compile blocks (VERDICT r3 #5); no-op for
        # cacheless sources. DMT_DECODE_WARMUP=0 disables for A/B.
        train_loader.start_cache_warmup()

    def generate_fn(z):
        return exp.generate(exp.g_state, z)

    start_epoch = 0
    if cfg.load_path and len(cfg.load_path) < 2:
        start_epoch, states = load_checkpoint(
            cfg.load_path[0], {"g": exp.g_state, "d": exp.d_state})
        exp.g_state, exp.d_state = states["g"], states["d"]
        if mesh is not None:
            exp.g_state = replicate(exp.g_state, mesh)
            exp.d_state = replicate(exp.d_state, mesh)
    elif cfg.load_path and len(cfg.load_path) > 1 and cfg.to_train:
        raise ValueError("Cannot load more than one model for training")

    meter = Throughput()
    ckpt = AsyncCheckpointer(
        opt_state_dtype=getattr(cfg, "checkpoint_save_dtype", None))
    emitter = _EpochEmitter(logger)
    if cfg.to_train:
        for epoch in range(start_epoch, cfg.epochs):
            meter.resume()
            sum_g, sum_d = None, None
            step_rng = jax.random.fold_in(rng, epoch)
            for i, (x, _) in enumerate(train_loader):
                exp.g_state, exp.d_state, m = exp.train_step(
                    exp.g_state, exp.d_state, x,
                    jax.random.fold_in(step_rng, i))
                sum_g = m["errG"] if sum_g is None else sum_g + m["errG"]
                sum_d = m["errD"] if sum_d is None else sum_d + m["errD"]
                meter.add(x.shape[0])
                if i % cfg.log_interval == 0:
                    print(f"[{epoch}/{cfg.epochs}][{i}/{len(train_loader)}] "
                          f"Loss_D: {float(m['errD']):.4f} "
                          f"Loss_G: {float(m['errG']):.4f} "
                          f"D(x): {float(m['D_x']):.4f} "
                          f"D(G(z)): {float(m['D_G_z1']):.4f}/"
                          f"{float(m['D_G_z2']):.4f}")
            n = train_loader.dataset_size
            avg_g, avg_d = float(sum_g) / n, float(sum_d) / n
            meter.pause()
            if _ckpt_due(cfg, epoch):
                ckpt.save(f"{cfg.model_path}/model_{epoch + 1}", epoch + 1,
                          {"g": exp.g_state, "d": exp.d_state},
                          rotate_keep=cfg.keep_checkpoints)
            emitter.emit(
                _maybe_fid_async(cfg, generate_fn, epoch,
                                 cfg.fid_path_samples),
                lambda fid, e=epoch, g=avg_g, d=avg_d: {
                    "Epoch": e, "Avg Loss G": g, "Avg Loss E": d,
                    "FID": fid},
                f"====> Epoch: {epoch} Average loss G: {avg_g:.4f} "
                f"Average loss D: {avg_d:.4f} FID: {{fid}} "
                f"({meter.rate():.1f} img/s)")
    last = emitter.finish()

    ckpt.wait()
    _eval_sweep(cfg, {"g": exp.g_state, "d": exp.d_state}, generate_fn,
                None, test_loader,
                assign=lambda s: (setattr(exp, "g_state", s["g"]),
                                  setattr(exp, "d_state", s["d"])))
    last["images_per_sec"] = meter.rate()
    return last


def run_vaegan(cfg: Config, logger: Optional[Logger] = None,
               devices=None) -> Dict:
    """Parity with experiments/new_betavaegan.py __main__ (:211-267).

    ``devices``: optional explicit chip group to run on (params, batches,
    and FID extraction all stay on the group). Lets several experiments —
    e.g. the parallel-β BO search (bo/driver.py) — train concurrently on
    disjoint groups of one machine's chips."""
    logger = logger or Logger(cfg.log_path, cfg)
    rng = jax.random.key(cfg.seed)
    exp = create_vaegan_experiment(cfg, rng)
    mesh, train_sharding = _setup_parallel(cfg, devices=devices)
    if mesh is not None:
        exp.eg_state = replicate(exp.eg_state, mesh)
        exp.d_state = replicate(exp.d_state, mesh)
    train_loader, _, test_loader = get_data_loader(cfg, sharding=train_sharding)
    if cfg.to_train:
        # decode the epoch-1 order into the RAM cache while the first
        # step's 4-7 min XLA compile blocks (VERDICT r3 #5); no-op for
        # cacheless sources. DMT_DECODE_WARMUP=0 disables for A/B.
        train_loader.start_cache_warmup()

    def decode_fn(z):
        return exp.decode(exp.eg_state, z)

    def recon_fn(x):
        return exp.reconstruct(exp.eg_state, x,
                               jax.random.fold_in(rng, 0x7FFFFFFF))

    start_epoch = 0
    if cfg.load_path and len(cfg.load_path) < 2:
        start_epoch, states = load_checkpoint(
            cfg.load_path[0], {"eg": exp.eg_state, "d": exp.d_state})
        exp.eg_state, exp.d_state = states["eg"], states["d"]
        if mesh is not None:
            exp.eg_state = replicate(exp.eg_state, mesh)
            exp.d_state = replicate(exp.d_state, mesh)
    elif cfg.load_path and len(cfg.load_path) > 1 and cfg.to_train:
        # reference quirk (new_betavaegan.py:215-216): ≥2 paths + to_train
        # silently trains from scratch; raise like run_gan instead
        raise ValueError("Cannot load more than one model for training")

    meter = Throughput()
    ckpt = AsyncCheckpointer(
        opt_state_dtype=getattr(cfg, "checkpoint_save_dtype", None))
    emitter = _EpochEmitter(logger)
    if cfg.to_train:
        for epoch in range(start_epoch, cfg.epochs):
            meter.resume()
            sums = None
            step_rng = jax.random.fold_in(rng, epoch)
            for i, (x, _) in enumerate(train_loader):
                exp.eg_state, exp.d_state, m = exp.train_step(
                    exp.eg_state, exp.d_state, x,
                    jax.random.fold_in(step_rng, i))
                keep = {k: m[k] for k in
                        ("recon_enc", "recon_dec", "dis", "D_x")}
                sums = keep if sums is None else \
                    {k: sums[k] + keep[k] for k in sums}
                meter.add(x.shape[0])
            n = train_loader.dataset_size
            enc_l, dec_l = float(sums["recon_enc"]) / n, \
                float(sums["recon_dec"]) / n
            dis_l, d_x = float(sums["dis"]) / n, float(sums["D_x"]) / n
            meter.pause()
            if _ckpt_due(cfg, epoch):
                ckpt.save(f"{cfg.model_path}/model_{epoch + 1}", epoch + 1,
                          {"eg": exp.eg_state, "d": exp.d_state},
                          rotate_keep=cfg.keep_checkpoints)
            # The reference scores per-epoch FID into fid_path_recons
            # (new_betavaegan.py:234) — an attribute EnvSetter never set;
            # our Config defines it (config.py).
            emitter.emit(
                _maybe_fid_async(cfg, decode_fn, epoch, cfg.fid_path_recons,
                                 devices=devices),
                lambda fid, e=epoch, a=enc_l, b=dec_l, c=dis_l: {
                    "Epoch": e, "Avg Eec Loss": a, "Avg Dnc Loss": b,
                    "Avg Dis Loss": c, "FID": fid},
                f"====> Epoch: {epoch} Avg Encoder Loss: {enc_l:.4f} "
                f"Avg Decoder Loss: {dec_l:.4f} "
                f"Avg Discriminator Loss: {dis_l:.4f} FID: {{fid}} "
                f"Dx: {d_x:.4f} ({meter.rate():.1f} img/s)",
                last_fn=lambda rec: {k: rec[k] for k in
                                     ("Avg Eec Loss", "Avg Dis Loss", "FID")})
    last = emitter.finish()

    ckpt.wait()
    _eval_sweep(cfg, {"eg": exp.eg_state, "d": exp.d_state}, decode_fn,
                recon_fn, test_loader,
                assign=lambda s: (setattr(exp, "eg_state", s["eg"]),
                                  setattr(exp, "d_state", s["d"])))
    last["images_per_sec"] = meter.rate()
    return last


def _eval_sweep(cfg: Config, template_states: Dict, decode_fn,
                recon_fn, test_loader, assign: Callable) -> None:
    """Offline checkpoint sweep (reference: new_betavaegan.py:248-267,
    generate_samples_recons.py:36-56): for each --load_path checkpoint run
    FID / reconstructions / samples as flags dictate."""
    tmp_epoch = 0
    for m in cfg.load_path:
        epoch, states = load_checkpoint(m, template_states)
        assign(states)
        # de-collide repeated epochs, as the reference does (:253-254)
        epoch = epoch if (epoch != tmp_epoch and tmp_epoch < epoch) else tmp_epoch + 1
        tmp_epoch = epoch

        if cfg.calc_fid:
            fid = _maybe_fid(cfg, decode_fn, epoch, cfg.fid_path_samples)
            print(f"Calculated FID: {fid}")
        if cfg.test_recons and recon_fn is not None:
            gen_reconstructions(
                recon_fn, test_loader, epoch, cfg.test_results_path_recons,
                nrow=1, path_for_originals=cfg.test_results_path_originals)
            print("Generated reconstructions")
        if cfg.test_samples:
            generate_samples(decode_fn, epoch, 5, cfg.n_hidden,
                             cfg.test_results_path_samples, nrow=1,
                             rng_seed=cfg.seed)
            print("Generated samples")


def run_family(cfg: Config, logger: Optional[Logger] = None) -> Dict:
    """Smoke-level train loop for the birds/mnist model families (the
    reference defines the models but never trains them — SURVEY.md C8/C9).
    Train loader only (reference get_data_loader returns None val/test for
    these datasets, dataset.py:23-24,34-35)."""
    from .families import create_family_experiment

    logger = logger or Logger(cfg.log_path, cfg)
    rng = jax.random.key(cfg.seed)
    exp = create_family_experiment(cfg, rng)
    mesh, train_sharding = _setup_parallel(cfg)
    if mesh is not None:
        exp.eg_state = replicate(exp.eg_state, mesh)
        exp.d_state = replicate(exp.d_state, mesh)
    train_loader, _, _ = get_data_loader(cfg, sharding=train_sharding)
    if cfg.to_train:
        train_loader.start_cache_warmup()  # overlap first compile (r3 #5)

    def decode_fn(z):
        return exp.decode(exp.eg_state, z)

    start_epoch = 0
    if cfg.load_path and len(cfg.load_path) > 1:
        # the celebA runners run a multi-checkpoint EVAL sweep for >1 path;
        # families have no eval sweep — silently training from scratch
        # (overwriting the listed checkpoints) would be the worst outcome
        raise ValueError(
            "birds/mnist take exactly one --load_path (resume); "
            "multi-checkpoint eval sweeps are celebA-only")
    if cfg.load_path:
        start_epoch, states = load_checkpoint(
            cfg.load_path[0], {"eg": exp.eg_state, "d": exp.d_state})
        exp.eg_state, exp.d_state = states["eg"], states["d"]
        if mesh is not None:
            exp.eg_state = replicate(exp.eg_state, mesh)
            exp.d_state = replicate(exp.d_state, mesh)

    meter = Throughput()
    ckpt = AsyncCheckpointer(
        opt_state_dtype=getattr(cfg, "checkpoint_save_dtype", None))
    emitter = _EpochEmitter(logger)
    if cfg.to_train:
        for epoch in range(start_epoch, cfg.epochs):
            meter.resume()
            step_rng = jax.random.fold_in(rng, epoch)
            total = total_recon = None
            for i, (x, _) in enumerate(train_loader):
                exp.eg_state, exp.d_state, m = exp.train_step(
                    exp.eg_state, exp.d_state, x,
                    jax.random.fold_in(step_rng, i))
                total = m["loss"] if total is None else total + m["loss"]
                total_recon = (m["recon"] if total_recon is None
                               else total_recon + m["recon"])
                meter.add(x.shape[0])
            avg_loss = float(total) / train_loader.dataset_size
            avg_recon = float(total_recon) / train_loader.dataset_size
            meter.pause()
            if _ckpt_due(cfg, epoch):
                ckpt.save(f"{cfg.model_path}/model_{epoch + 1}", epoch + 1,
                          {"eg": exp.eg_state, "d": exp.d_state},
                          rotate_keep=cfg.keep_checkpoints)
            # FID needs 3-channel samples and z_dim == n_hidden; only the
            # birds generator satisfies both.
            # "Avg Recon Loss" is family-only (no reference schema exists —
            # the reference never ran these models, SURVEY C8/C9); the
            # celebA experiments' logged keys stay reference-exact
            emitter.emit(
                _maybe_fid_async(cfg, decode_fn, epoch, cfg.fid_path_samples)
                if cfg.dataset == "birds" else _instant_na(),
                lambda fid, e=epoch, a=avg_loss, r=avg_recon: {
                    "Epoch": e, "Avg Loss": a, "Avg Recon Loss": r,
                    "FID": fid},
                f"====> Epoch: {epoch} Average loss: {avg_loss:.4f} "
                f"(recon {avg_recon:.4f}) FID: {{fid}} "
                f"({meter.rate():.1f} img/s)")
    last = emitter.finish()

    ckpt.wait()
    last["images_per_sec"] = meter.rate()
    return last


RUNNERS = {"vae": run_vae, "gan": run_gan,
           "betavaegan": run_vaegan, "vaegan": run_vaegan}

# birds/mnist route to their model family regardless of --model (the
# celebA experiment archs are dataset-specific; reference model.py keeps
# one family per dataset).
FAMILY_DATASETS = ("birds", "mnist")
