"""ColQwen2 processor (reference models/colqwen2/processing_colqwen2.py):
Qwen2-VL grid image tier with the fixed visual prompt; queries as in
ColPali."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ..colpali.processing_colpali import ColPaliProcessor
from ..qwen2_vl.processing_qwen2_vl import Qwen2VLProcessor


class ColQwen2Processor(Qwen2VLProcessor):
    query_augmentation_token = "<|endoftext|>"

    def __init__(self, image_processor=None, tokenizer=None,
                 visual_prompt_prefix: str | None = None,
                 query_prefix: str = "Query: ", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         **kwargs)
        self.visual_prompt_prefix = visual_prompt_prefix or (
            "<|im_start|>user\n<|vision_start|><|image_pad|><|vision_end|>"
            "Describe the image.<|im_end|><|endoftext|>")
        self.query_prefix = query_prefix

    def __call__(self, images=None, text=None, return_tensors="jax",
                 padding=True, suffix=None, **kwargs) -> BatchFeature:
        if images is not None:
            n = len(images) if isinstance(images, (list, tuple)) else 1
            return super().__call__(text=[self.visual_prompt_prefix] * n,
                                    images=images,
                                    return_tensors=return_tensors,
                                    padding=padding, **kwargs)
        if text is None:
            raise ValueError("Pass images (passages) or text (queries).")
        if isinstance(text, str):
            text = [text]
        aug = suffix if suffix is not None else self.query_augmentation_token * 10
        queries = [f"{self.query_prefix}{q}{aug}" for q in text]
        return BatchFeature(dict(self.tokenizer(
            queries, return_tensors=return_tensors, padding=padding)))

    def process_images(self, images, **kwargs):
        return self.__call__(images=images, **kwargs)

    def process_queries(self, text, **kwargs):
        return self.__call__(text=text, **kwargs)

    score_retrieval = staticmethod(ColPaliProcessor.score_retrieval)
