"""GOT-OCR2 processor (reference models/got_ocr2/processing_got_ocr2.py):
when no text is given, a chat-format OCR query is synthesized per image
(optionally with box/color constraints); ``<imgpad>`` expands to
``num_image_tokens`` per patch between ``<img>...</img>``."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class GotOcr2Processor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    message_start_token = "<|im_start|>"
    message_end_token = "<|im_end|>"
    img_start_token = "<img>"
    img_end_token = "</img>"
    image_token = "<imgpad>"
    system_query = ("system\nYou should follow the instructions carefully and "
                    "explain your answers in detail.")

    def __init__(self, image_processor=None, tokenizer=None,
                 num_image_tokens: int = 256, **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer, **kwargs)
        self.num_image_tokens = num_image_tokens

    def _query(self, fmt, box, color, crop_to_patches, multi_page):
        q = ""
        if color is not None:
            q += f"[{color}] "
        if box is not None:
            q += f"{box} "
        q += "OCR"
        if fmt:
            q += " with format"
        if multi_page:
            q += " across multi pages"
        if crop_to_patches:
            q += " upon the patch reference"
        q += ": "
        return q

    def __call__(self, images=None, text=None, format=False, box=None,
                 color=None, crop_to_patches=False, multi_page=False,
                 return_tensors="jax", padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if images is not None and not isinstance(images, (list, tuple)):
            images = [images]
        if images is not None:
            img = self.image_processor(images, return_tensors=return_tensors,
                                       crop_to_patches=crop_to_patches)
            num_patches = list(img.pop("num_patches", [1] * len(images)))
            data.update(img)
            if text is None:
                query = self._query(format, box, color, crop_to_patches, multi_page)
                text = []
                for n in num_patches:
                    image_seq = (self.img_start_token
                                 + self.image_token * (self.num_image_tokens * int(n))
                                 + self.img_end_token)
                    text.append(self.message_start_token + self.system_query
                                + self.message_end_token
                                + self.message_start_token + "user\n"
                                + image_seq + "\n" + query
                                + self.message_end_token
                                + self.message_start_token + "assistant\n")
        if text is not None:
            if isinstance(text, str):
                text = [text]
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding,
                                       **{k: v for k, v in kwargs.items()
                                          if k in ("truncation", "max_length",
                                                   "add_special_tokens")}))
        return BatchFeature(data)
