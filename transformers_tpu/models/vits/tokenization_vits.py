"""VITS tokenizer (reference src/transformers/models/vits/tokenization_vits.py).

Character-level: lowercase (keeping multi-char vocab entries), drop
characters missing from the vocab, and intersperse token id 0 (``<pad>``)
between characters (``add_blank``). Phonemization (espeak) is out of scope —
MMS-TTS checkpoints are character-based.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ...tokenization.base import BatchEncoding
from ...utils.hub import cached_file


class VitsTokenizer:
    def __init__(self, vocab: dict, pad_token="<pad>", unk_token="<unk>",
                 add_blank=True, normalize=True, **kwargs):
        self.encoder = vocab
        self.decoder = {v: k for k, v in vocab.items()}
        self.pad_token = pad_token
        self.unk_token = unk_token
        self.add_blank = add_blank
        self.normalize = normalize

    @classmethod
    def from_pretrained(cls, path_or_repo, **kwargs):
        vocab_file = cached_file(str(path_or_repo), "vocab.json")
        with open(vocab_file, encoding="utf-8") as f:
            vocab = json.load(f)
        cfg = {}
        cfg_file = cached_file(str(path_or_repo), "tokenizer_config.json",
                               _raise_exceptions_for_missing_entries=False)
        if cfg_file:
            with open(cfg_file, encoding="utf-8") as f:
                cfg = json.load(f)
        cfg.update(kwargs)
        known = {k: v for k, v in cfg.items()
                 if k in ("pad_token", "unk_token", "add_blank", "normalize")}
        return cls(vocab, **known)

    def save_pretrained(self, save_directory):
        os.makedirs(save_directory, exist_ok=True)
        with open(os.path.join(save_directory, "vocab.json"), "w", encoding="utf-8") as f:
            json.dump(self.encoder, f, ensure_ascii=False)
        with open(os.path.join(save_directory, "tokenizer_config.json"), "w") as f:
            json.dump({"tokenizer_class": "VitsTokenizer", "add_blank": self.add_blank,
                       "normalize": self.normalize, "pad_token": self.pad_token,
                       "unk_token": self.unk_token}, f)

    @property
    def pad_token_id(self):
        return self.encoder.get(self.pad_token, 0)

    def normalize_text(self, text: str) -> str:
        """Lowercase while preserving cased vocab entries (reference :115-134)."""
        vocab_words = sorted(self.encoder, key=len, reverse=True)
        out = []
        i = 0
        while i < len(text):
            for word in vocab_words:
                if len(word) > 1 and text[i:i + len(word)] == word:
                    out.append(word)
                    i += len(word)
                    break
            else:
                out.append(text[i].lower())
                i += 1
        return "".join(out)

    def _encode_one(self, text: str) -> list[int]:
        if self.normalize:
            text = self.normalize_text(text)
            text = "".join(ch for ch in text if ch in self.encoder)
        tokens = list(text)
        if self.add_blank:
            interspersed = [self.decoder.get(0, self.pad_token)] * (len(tokens) * 2 + 1)
            interspersed[1::2] = tokens
            tokens = interspersed
        unk = self.encoder.get(self.unk_token)
        return [self.encoder.get(t, unk) for t in tokens]

    def __call__(self, text, return_tensors=None, padding=False, **kwargs) -> BatchEncoding:
        texts = [text] if isinstance(text, str) else list(text)
        ids = [self._encode_one(t) for t in texts]
        max_len = max(len(x) for x in ids)
        pad_id = self.pad_token_id
        mask = [[1] * len(x) + [0] * (max_len - len(x)) for x in ids]
        ids = [x + [pad_id] * (max_len - len(x)) for x in ids]
        enc = BatchEncoding({"input_ids": ids, "attention_mask": mask})
        if return_tensors == "jax":
            import jax.numpy as jnp

            enc = BatchEncoding({k: jnp.asarray(v) for k, v in enc.items()})
        elif return_tensors in ("np", "numpy"):
            enc = BatchEncoding({k: np.asarray(v) for k, v in enc.items()})
        return enc

    def decode(self, ids, **kwargs) -> str:
        tokens = [self.decoder.get(int(i), "") for i in ids]
        if self.add_blank and len(tokens) > 1:
            tokens = tokens[1::2]
        return "".join(tokens)
