"""SAM2 processor (reference models/sam2/processing_sam2.py): identical
prompt-rescaling convention to SAM."""

from __future__ import annotations

from ..sam.processing_sam import SamProcessor


class Sam2Processor(SamProcessor):
    pass
