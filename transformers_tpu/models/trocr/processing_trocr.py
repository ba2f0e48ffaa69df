"""TrOCRProcessor: ViT image processor + XLM-R/BPE tokenizer; text is tokenized as decoder labels."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin

class TrOCRProcessor(ProcessorMixin):
    """Reference models/trocr/processing_trocr.py: when only text is passed
    the tokenizer output doubles as ``labels``."""

    attributes = ["image_processor", "tokenizer"]

    def __call__(self, images=None, text=None, **kwargs):
        out = super().__call__(text=text, images=images, **kwargs)
        if text is not None and images is not None:
            out["labels"] = out["input_ids"]
        return out
