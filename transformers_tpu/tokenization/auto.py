"""AutoTokenizer (reference models/auto/tokenization_auto.py).

All tokenizer.json checkpoints share one engine, so AutoTokenizer is thin:
it loads the engine + config. Exotic tokenizers (character-level VITS) are
dispatched by the ``tokenizer_class`` recorded in tokenizer_config.json.
"""

from __future__ import annotations

import json

from ..utils.hub import cached_file
from .base import PreTrainedTokenizer

# tokenizer_class name -> (module under transformers_tpu.models, class)
_SPECIAL_TOKENIZERS = {
    "VitsTokenizer": ("vits", "VitsTokenizer"),
    "ByT5Tokenizer": ("byt5", "ByT5Tokenizer"),
    "BertweetTokenizer": ("bertweet", "BertweetTokenizer"),
    "PhobertTokenizer": ("phobert", "PhobertTokenizer"),
    "HerbertTokenizer": ("herbert", "HerbertTokenizer"),
    "HerbertTokenizerFast": ("herbert", "HerbertTokenizer"),
    "MyT5Tokenizer": ("myt5", "MyT5Tokenizer"),
    "BertJapaneseTokenizer": ("bert_japanese", "BertJapaneseTokenizer"),
    "CpmTokenizer": ("cpm", "CpmTokenizer"),
    "CodeLlamaTokenizer": ("code_llama", "CodeLlamaTokenizer"),
    "MBart50Tokenizer": ("mbart50", "MBart50Tokenizer"),
    "MBart50TokenizerFast": ("mbart50", "MBart50Tokenizer"),
}


class AutoTokenizer:
    def __init__(self):
        raise OSError("Use AutoTokenizer.from_pretrained(...)")

    @classmethod
    def from_pretrained(cls, path_or_repo, **kwargs):
        cfg_file = cached_file(str(path_or_repo), "tokenizer_config.json",
                               _raise_exceptions_for_missing_entries=False)
        if cfg_file:
            with open(cfg_file, encoding="utf-8") as f:
                tok_class = json.load(f).get("tokenizer_class")
            if tok_class in _SPECIAL_TOKENIZERS:
                import importlib

                module_name, class_name = _SPECIAL_TOKENIZERS[tok_class]
                module = importlib.import_module(f"transformers_tpu.models.{module_name}")
                return getattr(module, class_name).from_pretrained(path_or_repo, **kwargs)
        return PreTrainedTokenizer.from_pretrained(path_or_repo, **kwargs)
