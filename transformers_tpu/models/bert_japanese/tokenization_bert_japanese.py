"""BertJapanese tokenizer (reference models/bert_japanese/tokenization_bert_japanese.py).

Word segmentation (MeCab/Sudachi/Jumanpp — external C libraries absent from
this image) followed by WordPiece or per-character tokenization. The
in-tree fallback covers ``word_tokenizer_type="basic"`` (whitespace +
punctuation) and both subword modes over the standard vocab.txt, which is
the reference behavior minus the morphological analyzers.
"""

from __future__ import annotations

import os
import unicodedata


class BertJapaneseTokenizer:
    def __init__(self, vocab_file, subword_tokenizer_type="wordpiece",
                 word_tokenizer_type="basic", unk_token="[UNK]", sep_token="[SEP]",
                 pad_token="[PAD]", cls_token="[CLS]", mask_token="[MASK]", **kwargs):
        if word_tokenizer_type in ("mecab", "sudachi", "jumanpp"):
            raise ImportError(
                f"word_tokenizer_type={word_tokenizer_type!r} needs the external "
                "morphological analyzer, which is not available; use 'basic'.")
        self.vocab = {}
        with open(vocab_file, encoding="utf-8") as f:
            for line in f:
                tok = line.rstrip("\n")
                if tok:
                    self.vocab[tok] = len(self.vocab)
        self.ids_to_tokens = {v: k for k, v in self.vocab.items()}
        self.subword_type = subword_tokenizer_type
        self.unk_token, self.sep_token, self.pad_token = unk_token, sep_token, pad_token
        self.cls_token, self.mask_token = cls_token, mask_token

    def _basic_tokenize(self, text):
        out = []
        word = ""
        for ch in text:
            cat = unicodedata.category(ch)
            if ch.isspace():
                if word:
                    out.append(word)
                    word = ""
            elif cat.startswith("P"):
                if word:
                    out.append(word)
                    word = ""
                out.append(ch)
            else:
                word += ch
        if word:
            out.append(word)
        return out

    def _wordpiece(self, word):
        if word in self.vocab:
            return [word]
        pieces = []
        start = 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return [self.unk_token]
            pieces.append(piece)
            start = end
        return pieces

    def tokenize(self, text):
        tokens = []
        for word in self._basic_tokenize(text):
            if self.subword_type == "character":
                tokens.extend(ch if ch in self.vocab else self.unk_token for ch in word)
            else:
                tokens.extend(self._wordpiece(word))
        return tokens

    def convert_tokens_to_ids(self, tokens):
        unk = self.vocab[self.unk_token]
        return [self.vocab.get(t, unk) for t in tokens]

    def encode(self, text, add_special_tokens=True):
        ids = self.convert_tokens_to_ids(self.tokenize(text))
        if add_special_tokens:
            return ([self.vocab[self.cls_token]] + ids + [self.vocab[self.sep_token]])
        return ids

    def decode(self, ids, skip_special_tokens=True):
        specials = {self.cls_token, self.sep_token, self.pad_token, self.mask_token}
        toks = [self.ids_to_tokens.get(int(i), self.unk_token) for i in ids]
        if skip_special_tokens:
            toks = [t for t in toks if t not in specials]
        return " ".join(toks).replace(" ##", "")

    @classmethod
    def from_pretrained(cls, path, **kwargs):
        return cls(os.path.join(str(path), "vocab.txt"), **kwargs)
