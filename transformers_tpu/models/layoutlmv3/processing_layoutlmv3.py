"""LayoutLMv3 processor (reference
models/layoutlmv3/processing_layoutlmv3.py + tokenization_layoutlmv3.py):
the image processor resizes the page; words + normalized 0-1000 boxes come
from the caller (the reference's apply_ocr tesseract tier is host OCR, out
of scope — pass boxes=). Each word's subword tokens inherit the word box;
CLS/SEP/PAD carry the special boxes."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin

CLS_BOX = [0, 0, 0, 0]
SEP_BOX = [1000, 1000, 1000, 1000]
PAD_BOX = [0, 0, 0, 0]


class LayoutProcessorBase(ProcessorMixin):
    """Shared word+box tokenization for the layout family (LayoutLMv3,
    LayoutXLM, UDOP, BROS)."""

    attributes = ["image_processor", "tokenizer"]
    add_cls_sep = True

    def _encode_words(self, words, boxes, max_length=None):
        tok = self.tokenizer
        ids: list[int] = []
        bbs: list[list[int]] = []
        for word, box in zip(words, boxes):
            wids = tok.encode(word, add_special_tokens=False)
            ids.extend(wids)
            bbs.extend([list(box)] * len(wids))
        if self.add_cls_sep:
            cls_id = getattr(tok, "cls_token_id", None)
            sep_id = getattr(tok, "sep_token_id", None)
            if cls_id is None:
                cls_id = getattr(tok, "bos_token_id", None)
            if sep_id is None:
                sep_id = getattr(tok, "eos_token_id", None)
            if cls_id is not None:
                ids = [cls_id] + ids
                bbs = [CLS_BOX] + bbs
            if sep_id is not None:
                ids = ids + [sep_id]
                bbs = bbs + [SEP_BOX]
        if max_length is not None:
            ids, bbs = ids[:max_length], bbs[:max_length]
        return ids, bbs

    def __call__(self, images=None, text=None, boxes=None, word_labels=None,
                 return_tensors="np", padding=True, max_length=None,
                 **kwargs) -> BatchFeature:
        data: dict = {}
        if images is not None and self.image_processor is not None:
            data.update(self.image_processor(images, return_tensors=return_tensors))
        if text is not None:
            if isinstance(text[0], str) and boxes is not None \
                    and not isinstance(boxes[0][0], (list, tuple)):
                text, boxes = [text], [boxes]
            encs = [self._encode_words(w, b, max_length)
                    for w, b in zip(text, boxes)]
            target = max(len(e[0]) for e in encs)
            pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
            n = len(encs)
            input_ids = np.full((n, target), pad_id, np.int64)
            bbox = np.zeros((n, target, 4), np.int64)
            mask = np.zeros((n, target), np.int64)
            for i, (ids, bbs) in enumerate(encs):
                input_ids[i, :len(ids)] = ids
                bbox[i, :len(bbs)] = bbs
                bbox[i, len(bbs):] = PAD_BOX
                mask[i, :len(ids)] = 1
            data.update({"input_ids": input_ids, "bbox": bbox,
                         "attention_mask": mask})
            if word_labels is not None:
                if not isinstance(word_labels[0], (list, tuple)):
                    word_labels = [word_labels]
                labels = np.full((n, target), -100, np.int64)
                for i, (w, wl) in enumerate(zip(text, word_labels)):
                    pos = 1 if self.add_cls_sep else 0
                    for word, lab in zip(w, wl):
                        wids = self.tokenizer.encode(word, add_special_tokens=False)
                        if pos < target:
                            labels[i, pos] = lab  # first subtoken only
                        pos += len(wids)
                data["labels"] = labels
        if return_tensors == "jax":
            import jax.numpy as jnp

            data = {k: jnp.asarray(v) for k, v in data.items()}
        return BatchFeature(data)


class LayoutLMv3Processor(LayoutProcessorBase):
    pass
