"""HerBERT tokenizer (reference models/herbert/tokenization_herbert.py):
XLM-style BPE — vocab.json + merges.txt with ``</w>`` end-of-word suffix —
under a BERT pre-tokenizer. Expressed as an engine config (the fast backend
the reference wraps)."""

from __future__ import annotations

import json
import os

from ...tokenization.base import PreTrainedTokenizer
from ...tokenization.engine import TokenizerEngine


def herbert_engine_config(vocab: dict, merges: list) -> dict:
    return {
        "version": "1.0",
        "added_tokens": [
            {"id": vocab.get(t, i), "content": t, "special": True, "normalized": False,
             "lstrip": False, "rstrip": False, "single_word": False}
            for i, t in enumerate(["<s>", "<pad>", "</s>", "<unk>", "<mask>"])
            if t in vocab],
        "normalizer": {"type": "BertNormalizer", "lowercase": False,
                       "strip_accents": False, "clean_text": True,
                       "handle_chinese_chars": True},
        "pre_tokenizer": {"type": "BertPreTokenizer"},
        "post_processor": None,
        "decoder": {"type": "BPEDecoder", "suffix": "</w>"},
        "model": {"type": "BPE", "vocab": vocab,
                  "merges": [list(m) for m in merges], "end_of_word_suffix": "</w>",
                  "unk_token": "<unk>", "fuse_unk": False},
    }


class HerbertTokenizer(PreTrainedTokenizer):
    @classmethod
    def from_pretrained(cls, path, **kwargs):
        tok_json = os.path.join(str(path), "tokenizer.json")
        if os.path.exists(tok_json):
            return super().from_pretrained(path, **kwargs)
        with open(os.path.join(str(path), "vocab.json"), encoding="utf-8") as f:
            vocab = json.load(f)
        merges = []
        with open(os.path.join(str(path), "merges.txt"), encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#version"):
                    continue
                merges.append(tuple(line.split()[:2]))
        engine = TokenizerEngine(herbert_engine_config(vocab, merges))
        return cls._from_engine(engine, path, kwargs)
