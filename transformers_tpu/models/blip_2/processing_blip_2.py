"""BLIP-2 processor (reference models/blip_2/processing_blip_2.py): prepends
``num_query_tokens`` image placeholder tokens before the (special-token-free)
text encoding — BLIP expects image tokens at the very beginning, before BOS."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class Blip2Processor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 num_query_tokens: int | None = None,
                 image_token: str = "<image>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         **kwargs)
        self.num_query_tokens = num_query_tokens
        self.image_token = image_token

    def __call__(self, text=None, images=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        if images is None and text is None:
            raise ValueError("You have to specify either images or text.")
        data: dict = {}
        if images is not None:
            data.update(self.image_processor(images, return_tensors=return_tensors))
        if text is not None:
            if isinstance(text, str):
                text = [text]
            enc = self.tokenizer(
                text, return_tensors=None, padding=padding,
                **{k: v for k, v in kwargs.items()
                   if k in ("truncation", "max_length", "add_special_tokens")})
            if images is not None and self.num_query_tokens is not None:
                # image tokens go BEFORE everything, including BOS, and are
                # never padded/truncated (reference __call__ comment)
                img_ids = self.tokenizer.encode(
                    self.image_token * self.num_query_tokens,
                    add_special_tokens=False)
                enc["input_ids"] = [img_ids + ids for ids in enc["input_ids"]]
                if "attention_mask" in enc:
                    enc["attention_mask"] = [[1] * len(img_ids) + m
                                             for m in enc["attention_mask"]]
            if return_tensors in ("np", "jax"):
                import jax.numpy as jnp

                to = np.asarray if return_tensors == "np" else jnp.asarray
                enc = {k: to(v) for k, v in enc.items()}
            data.update(enc)
        return BatchFeature(data)
