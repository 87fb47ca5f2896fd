from .losses import bce, kld, sim_loss, reconstruction_loss, vae_loss

__all__ = ["bce", "kld", "sim_loss", "reconstruction_loss", "vae_loss"]
