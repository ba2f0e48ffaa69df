"""BARTpho (reference models/bartpho/): Vietnamese BART — mbart skeleton +
SentencePiece tokenizer (monolingual vocab over the multilingual model,
reference tokenization_bartpho.py)."""
from ...tokenization.base import PreTrainedTokenizer as BartphoTokenizer  # noqa: F401
