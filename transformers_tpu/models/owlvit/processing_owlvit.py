"""OWL-ViT processor (reference models/owlvit/processing_owlvit.py): CLIP
tokenizer + OwlViT image processor. Text queries may be nested (one list per
image); every per-image batch is tokenized at padding="max_length" and the
encodings are stacked to [sum_queries, L]. ``query_images`` produce
``query_pixel_values`` for image-guided detection."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class OwlViTProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __call__(self, text=None, images=None, query_images=None,
                 padding="max_length", return_tensors="jax", **kwargs) -> BatchFeature:
        if text is None and images is None and query_images is None:
            raise ValueError("Pass at least one of text, images, query_images.")
        data = {}
        if text is not None:
            if isinstance(text, str):
                text = [text]
            if text and isinstance(text[0], (list, tuple)):
                # nested: one query list per image — pad every batch to the
                # longest query count with "" and tokenize all rows together
                # so every [sum_queries, L] row shares one padded length
                # (reference :95-104)
                max_q = max(len(t) for t in text)
                flat = []
                for t in text:
                    flat.extend(list(t) + [""] * (max_q - len(t)))
                enc = self.tokenizer(flat, padding=padding, return_tensors="np",
                                     **{k: v for k, v in kwargs.items()
                                        if k in ("truncation", "max_length")})
                data["input_ids"] = np.asarray(enc["input_ids"])
                data["attention_mask"] = np.asarray(enc["attention_mask"])
            else:
                enc = self.tokenizer(list(text), padding=padding, return_tensors="np",
                                     **{k: v for k, v in kwargs.items()
                                        if k in ("truncation", "max_length")})
                data["input_ids"] = np.asarray(enc["input_ids"])
                data["attention_mask"] = np.asarray(enc["attention_mask"])
        if query_images is not None:
            data["query_pixel_values"] = self.image_processor(
                query_images, return_tensors="np")["pixel_values"]
        if images is not None:
            data.update(self.image_processor(images, return_tensors="np"))
        if return_tensors == "jax":
            import jax.numpy as jnp

            data = {k: jnp.asarray(v) for k, v in data.items()}
        return BatchFeature(data)

    def post_process_object_detection(self, *args, **kwargs):
        return self.image_processor.post_process_object_detection(*args, **kwargs)

    def post_process_grounded_object_detection(self, *args, **kwargs):
        return self.image_processor.post_process_object_detection(*args, **kwargs)
