"""mLUKE (reference models/mluke/): XLM-R SentencePiece tokenizer plus LUKE
entity vocabulary handling (entity spans resolved host-side)."""
from ...tokenization.base import PreTrainedTokenizer as MLukeTokenizer  # noqa: F401
