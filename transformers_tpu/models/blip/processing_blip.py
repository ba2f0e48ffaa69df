"""BLIP processor (reference models/blip/processing_blip.py): BERT tokenizer
+ BlipImageProcessor; token_type_ids are dropped (reference
``unused_input_names``)."""

from __future__ import annotations

from ...processing_utils import ProcessorMixin


class BlipProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __call__(self, *args, **kwargs):
        out = super().__call__(*args, **kwargs)
        out.pop("token_type_ids", None)
        return out
