from .common import ModelState, make_adam, init_model_state
from .vae import create_vae_experiment
from .gan import create_gan_experiment
from .vaegan import create_vaegan_experiment

__all__ = [
    "ModelState",
    "make_adam",
    "init_model_state",
    "create_vae_experiment",
    "create_gan_experiment",
    "create_vaegan_experiment",
]
