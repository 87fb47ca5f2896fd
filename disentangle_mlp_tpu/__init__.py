"""disentangle_mlp_tpu — a TPU-native JAX framework for (β-)VAE-GAN research.

A ground-up rebuild of the capabilities of RicoFio/disentangle_mlp
(reference: /root/reference) designed for TPUs:

- Flax/NHWC conv models (VAE, DCGAN generator/discriminator; birds/mnist
  families) with exact PyTorch output-shape semantics
  (reference: models/model.py).
- One jitted train step per experiment, including the alternating
  three-optimizer β-VAE-GAN update (reference: experiments/new_betavaegan.py).
- Device-fed input pipeline with parallel decode and sharded prefetch
  (reference: dataloader/dataset.py).
- On-device FID: JAX InceptionV3 pool3 features + eigh-based Fréchet
  distance (reference: scoring/fid.py, scoring/inception.py).
- Data parallelism via jax.sharding.Mesh + jit over ICI
  (reference: torch.nn.DataParallel in experiments/*.py).
- GP/EI Bayesian optimization over β with FID-in-the-loop
  (reference: bayesian_optimization/final_bo.py).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import disentangle_mlp_tpu` free of jax
    initialization side effects)."""
    if name in ("Config", "EnvSetter", "config_from_args"):
        from . import config
        return getattr(config, name)
    if name in ("run_vae", "run_gan", "run_vaegan", "run_family", "RUNNERS"):
        from .train import loop
        return getattr(loop, name)
    if name == "run_reproduction":
        from .eval.reproduce import run_reproduction
        return run_reproduction
    if name in ("get_fid", "get_fid_from_samples", "frechet_distance"):
        from .eval import fid
        return getattr(fid, name)
    if name == "get_data_loader":
        from .data.pipeline import get_data_loader
        return get_data_loader
    if name == "Logger":
        from .utils.logger import Logger
        return Logger
    raise AttributeError(name)
