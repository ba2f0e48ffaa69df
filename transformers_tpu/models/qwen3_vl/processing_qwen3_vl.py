"""Qwen3-VL processor (reference models/qwen3_vl/processing_qwen3_vl.py):
same grid-expansion calling convention as Qwen2-VL (shared image/video tier;
the vision-start/end framing lives in the chat template)."""

from __future__ import annotations

from ..qwen2_vl.processing_qwen2_vl import Qwen2VLProcessor


class Qwen3VLProcessor(Qwen2VLProcessor):
    pass
