"""Mllama processor (reference models/mllama/processing_mllama.py): the
``<|image|>`` token is NOT expanded (cross-attention consumes tiles); the
prompt gets ``<|begin_of_text|>`` after any leading image tokens, and
``cross_attention_mask`` maps each text token to the images it may attend
to (reference get_cross_attention_token_mask / convert_..._to_4d semantics,
returned here in its [B, S, max_imgs] token-level form)."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin
from .image_processing_mllama import MllamaImageProcessor


def build_string_from_input(prompt: str, bos_token: str, image_token: str) -> str:
    """reference build_string_from_input: bos goes after leading image
    tokens, before the text."""
    if bos_token in prompt:
        return prompt
    n_leading = 0
    rest = prompt
    while rest.startswith(image_token):
        n_leading += 1
        rest = rest[len(image_token):]
    return image_token * n_leading + bos_token + rest


def get_cross_attention_token_mask(input_ids, image_token_id):
    """Per sample: for each image token, [start, -1] span (attend from the
    image token onward; reference get_cross_attention_token_mask)."""
    image_positions = [i for i, t in enumerate(input_ids) if t == image_token_id]
    if not image_positions:
        return []
    if len(image_positions) == 1:
        return [[image_positions[0], -1]]
    spans = []
    for i, pos in enumerate(image_positions):
        if i == len(image_positions) - 1:
            spans.append([pos, -1])
        else:
            spans.append([pos, image_positions[i + 1]])
    return spans


class MllamaProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 image_token: str = "<|image|>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         **kwargs)
        self.image_token = image_token

    def __call__(self, text=None, images=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if text is not None:
            if isinstance(text, str):
                text = [text]
            bos = getattr(self.tokenizer, "bos_token", "") or ""
            text = [build_string_from_input(t, bos, self.image_token)
                    for t in text]
            enc = self.tokenizer(
                text, return_tensors=return_tensors, padding=padding,
                add_special_tokens=False,
                **{k: v for k, v in kwargs.items()
                   if k in ("truncation", "max_length")})
            data.update(enc)
        if images is not None:
            data.update(self.image_processor(images, return_tensors=return_tensors))
        if text is not None and images is not None:
            tok_id = self.tokenizer.convert_tokens_to_ids(self.image_token)
            ids = np.asarray(data["input_ids"])
            max_imgs = np.asarray(data["aspect_ratio_ids"]).shape[1]
            mask = np.zeros((ids.shape[0], ids.shape[1], max_imgs), np.int64)
            for b in range(ids.shape[0]):
                for j, (start, end) in enumerate(
                        get_cross_attention_token_mask(ids[b].tolist(), tok_id)):
                    if j >= max_imgs:
                        break
                    mask[b, start:(None if end == -1 else end), j] = 1
            data["cross_attention_mask"] = mask
        return BatchFeature(data)

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, **kwargs):
        proc = super().from_pretrained(pretrained_model_name_or_path, **kwargs)
        if proc.image_processor is None:
            proc.image_processor = MllamaImageProcessor()
        return proc
