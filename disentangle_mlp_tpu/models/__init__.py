from .layers import TorchConv, TorchConvTranspose, TorchLinear, BatchNorm
from .vae import CelebaEncoder, CelebaDecoder, VAE
from .gan import GeneratorCeleba, DiscriminatorCeleba

__all__ = [
    "TorchConv",
    "TorchConvTranspose",
    "TorchLinear",
    "BatchNorm",
    "CelebaEncoder",
    "CelebaDecoder",
    "VAE",
    "GeneratorCeleba",
    "DiscriminatorCeleba",
]
