"""Wav2Vec2Phoneme CTC tokenizer (reference
models/wav2vec2_phoneme/tokenization_wav2vec2_phoneme.py): a vocab.json
phone-level tokenizer whose decode collapses CTC repeats and drops the pad
(blank) token. Phonemization (espeak via the ``phonemizer`` package) is
optional — pre-phonemized input (``do_phonemize=False``) is the fully
supported path on this image."""

from __future__ import annotations

import json
import os
from typing import Optional


class Wav2Vec2PhonemeCTCTokenizer:
    vocab_files_names = {"vocab_file": "vocab.json"}

    def __init__(self, vocab_file, bos_token="<s>", eos_token="</s>",
                 unk_token="<unk>", pad_token="<pad>",
                 phone_delimiter_token=" ", word_delimiter_token=None,
                 do_phonemize=True, phonemizer_lang="en-us",
                 phonemizer_backend="espeak", **kwargs):
        with open(vocab_file, encoding="utf-8") as f:
            self.encoder = json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bos_token = bos_token
        self.eos_token = eos_token
        self.unk_token = unk_token
        self.pad_token = pad_token
        self.phone_delimiter_token = phone_delimiter_token
        self.word_delimiter_token = word_delimiter_token
        self.do_phonemize = do_phonemize
        self.phonemizer_lang = phonemizer_lang
        self.phonemizer_backend = phonemizer_backend
        self.init_kwargs = dict(
            bos_token=bos_token, eos_token=eos_token, unk_token=unk_token,
            pad_token=pad_token, phone_delimiter_token=phone_delimiter_token,
            word_delimiter_token=word_delimiter_token,
            do_phonemize=do_phonemize, phonemizer_lang=phonemizer_lang,
            phonemizer_backend=phonemizer_backend)

    # ------------------------------------------------------------------ io
    @classmethod
    def from_pretrained(cls, path, **kwargs):
        path = str(path)
        cfg = {}
        cfg_file = os.path.join(path, "tokenizer_config.json")
        if os.path.exists(cfg_file):
            with open(cfg_file, encoding="utf-8") as f:
                cfg = {k: v for k, v in json.load(f).items()
                       if k in ("bos_token", "eos_token", "unk_token",
                                "pad_token", "phone_delimiter_token",
                                "word_delimiter_token", "do_phonemize",
                                "phonemizer_lang", "phonemizer_backend")}
        cfg.update(kwargs)
        return cls(os.path.join(path, "vocab.json"), **cfg)

    def save_pretrained(self, save_directory):
        os.makedirs(save_directory, exist_ok=True)
        with open(os.path.join(save_directory, "vocab.json"), "w",
                  encoding="utf-8") as f:
            json.dump(self.encoder, f, ensure_ascii=False)
        cfg = dict(self.init_kwargs)
        cfg["tokenizer_class"] = "Wav2Vec2PhonemeCTCTokenizer"
        with open(os.path.join(save_directory, "tokenizer_config.json"), "w",
                  encoding="utf-8") as f:
            json.dump(cfg, f, ensure_ascii=False)

    # -------------------------------------------------------------- encode
    @property
    def vocab_size(self):
        return len(self.encoder)

    def get_vocab(self):
        return dict(self.encoder)

    @property
    def pad_token_id(self):
        return self.encoder.get(self.pad_token)

    @property
    def word_delimiter_token_id(self):
        if self.word_delimiter_token is None:
            return None
        return self.encoder.get(self.word_delimiter_token)

    def phonemize(self, text: str, phonemizer_lang: Optional[str] = None) -> str:
        try:
            from phonemizer import phonemize
            from phonemizer.separator import Separator
        except ImportError as e:  # pragma: no cover - phonemizer not baked in
            raise ImportError(
                "Phonemizing raw text requires the `phonemizer` package; "
                "pass pre-phonemized input with do_phonemize=False.") from e
        separator = Separator(phone=self.phone_delimiter_token,
                              word=self.word_delimiter_token or "",
                              syllable="")
        return phonemize(
            text, language=phonemizer_lang or self.phonemizer_lang,
            backend=self.phonemizer_backend, separator=separator,
            punctuation_marks=";:,.!?¡¿—…\"«»“”", strip=True)[0].strip()

    def tokenize(self, text: str, **kwargs) -> list[str]:
        if self.do_phonemize:
            text = self.phonemize(text.strip())
        return [t for t in text.split(self.phone_delimiter_token) if t]

    def convert_tokens_to_ids(self, tokens):
        unk = self.encoder.get(self.unk_token)
        if isinstance(tokens, str):
            return self.encoder.get(tokens, unk)
        return [self.encoder.get(t, unk) for t in tokens]

    def __call__(self, text, **kwargs):
        from ...tokenization.base import BatchEncoding

        if isinstance(text, str):
            text = [text]
        ids = [self.convert_tokens_to_ids(self.tokenize(t)) for t in text]
        return BatchEncoding({"input_ids": ids if len(ids) > 1 else ids,
                              "attention_mask": [[1] * len(i) for i in ids]})

    # -------------------------------------------------------------- decode
    def convert_ids_to_tokens(self, ids):
        return [self.decoder.get(int(i), self.unk_token) for i in ids]

    def decode(self, token_ids, skip_special_tokens=False,
               group_tokens=True, filter_word_delimiter_token=True, **kwargs):
        import numpy as np

        ids = [int(i) for i in np.asarray(token_ids).reshape(-1)]
        if group_tokens:  # CTC collapse
            deduped = []
            prev = None
            for i in ids:
                if i != prev:
                    deduped.append(i)
                prev = i
            ids = deduped
        pad_id = self.pad_token_id
        ids = [i for i in ids if i != pad_id]
        tokens = self.convert_ids_to_tokens(ids)
        specials = {self.bos_token, self.eos_token, self.pad_token}
        if skip_special_tokens:
            tokens = [t for t in tokens if t not in specials]
        if filter_word_delimiter_token and self.word_delimiter_token:
            tokens = [t for t in tokens if t != self.word_delimiter_token]
        return self.phone_delimiter_token.join(tokens).strip()

    def batch_decode(self, sequences, **kwargs):
        return [self.decode(seq, **kwargs) for seq in sequences]
