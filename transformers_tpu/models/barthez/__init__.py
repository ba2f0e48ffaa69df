"""BARThez (reference models/barthez/): French BART — the modeling lives in
the bart skeleton; this package carries the SentencePiece tokenizer wiring
(sentencepiece.bpe.model via the in-tree spm converter)."""
from ...tokenization.base import PreTrainedTokenizer as BarthezTokenizer  # noqa: F401
