"""InstructBLIP processor (reference
models/instructblip/processing_instructblip.py): BLIP image processor + main
tokenizer (prompt prefixed with ``num_query_tokens`` image placeholders) +
a SECOND Q-Former tokenizer producing qformer_input_ids/attention_mask."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class InstructBlipProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer", "qformer_tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 qformer_tokenizer=None, num_query_tokens=None,
                 image_token: str = "<image>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         qformer_tokenizer=qformer_tokenizer, **kwargs)
        self.num_query_tokens = num_query_tokens
        self.image_token = getattr(tokenizer, "image_token", None) or image_token

    def __call__(self, images=None, text=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        tkw = {k: v for k, v in kwargs.items()
               if k in ("truncation", "max_length", "add_special_tokens")}
        if text is not None:
            prompts = text
            if images is not None and self.num_query_tokens:
                prompts = [self.image_token * self.num_query_tokens + t
                           for t in text]
            data.update(self.tokenizer(prompts, return_tensors=return_tensors,
                                       padding=padding, **tkw))
            q = self.qformer_tokenizer(text, return_tensors=return_tensors,
                                       padding=padding, **tkw)
            data["qformer_input_ids"] = q["input_ids"]
            data["qformer_attention_mask"] = q["attention_mask"]
        if images is not None:
            data.update(self.image_processor(images, return_tensors=return_tensors))
        return BatchFeature(data)
