"""Pix2Struct processor (reference
models/pix2struct/processing_pix2struct.py): flattened image patches +
decoder text (labels when both supplied). The reference's render-text-onto-
image path (VQA headers) is host-side PIL drawing, carried by the image
processor's ``header_text`` kwarg upstream; here text conditioning rides
the decoder."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class Pix2StructProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __call__(self, images=None, text=None, return_tensors="np",
                 padding=True, max_patches=None, **kwargs) -> BatchFeature:
        data: dict = {}
        if images is not None:
            data.update(self.image_processor(
                images, return_tensors=return_tensors,
                **({"max_patches": max_patches} if max_patches else {})))
        if text is not None:
            enc = self.tokenizer(text if not isinstance(text, str) else [text],
                                 return_tensors=return_tensors, padding=padding,
                                 **{k: v for k, v in kwargs.items()
                                    if k in ("truncation", "max_length",
                                             "add_special_tokens")})
            if images is None:
                data.update(enc)
            else:
                data["decoder_input_ids"] = enc["input_ids"]
                data["decoder_attention_mask"] = enc["attention_mask"]
        return BatchFeature(data)
