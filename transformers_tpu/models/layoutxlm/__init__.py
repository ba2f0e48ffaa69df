"""LayoutXLM (reference models/layoutxlm/): multilingual LayoutLMv2 — the
modeling is the layoutlm family; this package carries the XLM-R
SentencePiece tokenizer + box-aware processor contract."""
from ...tokenization.base import PreTrainedTokenizer as LayoutXLMTokenizer  # noqa: F401
from .processing_layoutxlm import LayoutXLMProcessor
