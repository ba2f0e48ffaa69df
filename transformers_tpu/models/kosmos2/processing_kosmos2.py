"""KOSMOS-2 processor (reference models/kosmos2/processing_kosmos2.py): the
prompt is prefixed with ``<image>`` + 64 image-slot tokens + ``</image>``;
``image_embeds_position_mask`` marks the slot positions the vision embeds
scatter into (reference preprocess_examples + __call__)."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class Kosmos2Processor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 num_image_tokens: int = 64, boi_token: str = "<image>",
                 eoi_token: str = "</image>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer, **kwargs)
        self.num_image_tokens = num_image_tokens
        self.boi_token = boi_token
        self.eoi_token = eoi_token

    def __call__(self, images=None, text=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        import jax.numpy as jnp

        data: dict = {}
        if isinstance(text, str):
            text = [text]
        if images is not None:
            data.update(self.image_processor(images, return_tensors=return_tensors))
        if text is not None:
            if images is not None:
                unk = getattr(self.tokenizer, "unk_token", "<unk>") or "<unk>"
                prefix = (self.boi_token + unk * self.num_image_tokens
                          + self.eoi_token)
                text = [f"{prefix} {t}" for t in text]
            enc = self.tokenizer(text, return_tensors="np", padding=padding,
                                 **{k: v for k, v in kwargs.items()
                                    if k in ("truncation", "max_length",
                                             "add_special_tokens")})
            ids = np.asarray(enc["input_ids"])
            mask = np.asarray(enc["attention_mask"])
            data["input_ids"] = ids
            data["attention_mask"] = mask
            if images is not None:
                # slots = the unk run between boi and eoi: positions 2..2+N
                # after the BOS + boi tokens (reference builds the mask by
                # construction, processing_kosmos2.py:217)
                pos_mask = np.zeros_like(ids)
                boi_id = self.tokenizer.convert_tokens_to_ids(self.boi_token)
                for b in range(ids.shape[0]):
                    row = ids[b].tolist()
                    if boi_id in row:
                        st = row.index(boi_id) + 1
                        pos_mask[b, st:st + self.num_image_tokens] = 1
                data["image_embeds_position_mask"] = pos_mask
            if return_tensors == "jax":
                data = {k: jnp.asarray(v) for k, v in data.items()}
        return BatchFeature(data)
