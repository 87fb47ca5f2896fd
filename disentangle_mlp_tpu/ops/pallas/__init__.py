from .image_ops import per_image_normalize_pallas
from .matmul_fused import fused_linear

__all__ = ["per_image_normalize_pallas", "fused_linear"]
