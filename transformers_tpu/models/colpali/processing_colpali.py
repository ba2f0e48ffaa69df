"""ColPali processor (reference models/colpali/processing_colpali.py): a
PaliGemma-format retrieval processor — images are encoded with the fixed
prompt "Describe the image.", queries get "Question: " + augmentation pad
tokens; ``score_retrieval`` computes the ColBERT MaxSim late-interaction
score."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ..paligemma.processing_paligemma import PaliGemmaProcessor


class ColPaliProcessor(PaliGemmaProcessor):
    query_augmentation_token = "<unk>"

    def __init__(self, image_processor=None, tokenizer=None,
                 visual_prompt_prefix: str = "Describe the image.",
                 query_prefix: str = "Question: ", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         **kwargs)
        self.visual_prompt_prefix = visual_prompt_prefix
        self.query_prefix = query_prefix

    def __call__(self, images=None, text=None, return_tensors="jax",
                 padding=True, suffix=None, **kwargs) -> BatchFeature:
        if images is not None:
            prompts = [self.visual_prompt_prefix] * (
                len(images) if isinstance(images, (list, tuple)) else 1)
            return super().__call__(text=prompts, images=images,
                                    return_tensors=return_tensors,
                                    padding=padding, **kwargs)
        if text is None:
            raise ValueError("Pass images (passages) or text (queries).")
        if isinstance(text, str):
            text = [text]
        aug = suffix if suffix is not None else self.query_augmentation_token * 10
        bos = getattr(self.tokenizer, "bos_token", "") or ""
        queries = [f"{bos}{self.query_prefix}{q}{aug}\n" for q in text]
        return BatchFeature(dict(self.tokenizer(
            queries, return_tensors=return_tensors, padding=padding,
            add_special_tokens=False)))

    def process_images(self, images, **kwargs):
        return self.__call__(images=images, **kwargs)

    def process_queries(self, text, **kwargs):
        return self.__call__(text=text, **kwargs)

    @staticmethod
    def score_retrieval(query_embeddings, passage_embeddings):
        """MaxSim: sum over query tokens of the max similarity across passage
        tokens. Accepts lists of [Lq, D] / [Lp, D] arrays; returns
        [n_queries, n_passages]."""
        scores = np.zeros((len(query_embeddings), len(passage_embeddings)),
                          np.float32)
        for i, q in enumerate(query_embeddings):
            qa = np.asarray(q, np.float32)
            for j, p in enumerate(passage_embeddings):
                pa = np.asarray(p, np.float32)
                sim = qa @ pa.T  # [Lq, Lp]
                scores[i, j] = sim.max(axis=1).sum()
        return scores
