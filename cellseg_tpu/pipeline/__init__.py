from .normalize import normalize_channel, normalize_image, normalize_image_jax
from .labels3c import create_interior_map

__all__ = [
    "normalize_channel",
    "normalize_image",
    "normalize_image_jax",
    "create_interior_map",
]
