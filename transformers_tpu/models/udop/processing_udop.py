"""UDOP processor (reference models/udop/processing_udop.py): layout word+box
tokenization (T5 tokenizer: no CLS, EOS-terminated) + page image patches."""

from __future__ import annotations

from ..layoutlmv3.processing_layoutlmv3 import LayoutProcessorBase


class UdopProcessor(LayoutProcessorBase):
    add_cls_sep = False

    def _encode_words(self, words, boxes, max_length=None):
        ids, bbs = super()._encode_words(words, boxes, max_length)
        eos = getattr(self.tokenizer, "eos_token_id", None)
        if eos is not None and (not ids or ids[-1] != eos):
            ids = ids + [eos]
            bbs = bbs + [[1000, 1000, 1000, 1000]]
        if max_length is not None:
            ids, bbs = ids[:max_length], bbs[:max_length]
        return ids, bbs
