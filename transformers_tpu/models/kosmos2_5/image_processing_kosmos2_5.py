"""KOSMOS-2.5 image processor (reference
models/kosmos2_5/image_processing_kosmos2_5.py): Pix2Struct variable-
resolution flattened patches (row/col ids prepended per patch)."""

from __future__ import annotations

from ..pix2struct.image_processing_pix2struct import Pix2StructImageProcessor


class Kosmos2_5ImageProcessor(Pix2StructImageProcessor):
    def __init__(self, max_patches=4096, **kwargs):
        super().__init__(max_patches=max_patches, **kwargs)
