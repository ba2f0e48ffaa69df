"""LayoutXLM processor (reference models/layoutxlm/processing_layoutxlm.py):
LayoutLMv2-format word+box tokenization with an XLM-R tokenizer."""

from __future__ import annotations

from ..layoutlmv3.processing_layoutlmv3 import LayoutProcessorBase


class LayoutXLMProcessor(LayoutProcessorBase):
    pass
