"""GPT-SW3 (reference models/gpt_sw3/): GPT-2 skeleton; SentencePiece
tokenizer loaded through the in-tree spm converter."""
from ...tokenization.base import PreTrainedTokenizer as GPTSw3Tokenizer  # noqa: F401
