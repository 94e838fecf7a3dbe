"""Host utilities: image IO, settings persistence, image grids, logging."""
from .nifti import (
    read_nifti, write_nifti, read_metaimage, write_metaimage,
    read_image, write_image,
)

__all__ = [
    "read_nifti", "write_nifti", "read_metaimage", "write_metaimage",
    "read_image", "write_image",
]
