"""Multimodal processors.

TPU-native analog of reference src/transformers/processing_utils.py
(``ProcessorMixin`` :597, ``__call__`` :652, multimodal token expansion
``get_text_with_replacements`` :815, ``apply_chat_template`` :1976). A
processor composes a tokenizer with image/audio processors and expands
multimodal placeholder tokens to their final sequence length so the model
sees static shapes.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import numpy as np

from .image_processing_utils import BatchFeature
from .utils import logging

logger = logging.get_logger(__name__)

PROCESSOR_NAME = "processor_config.json"


class ProcessorMixin:
    """Base processor: holds named sub-processors (``attributes``), forwards
    save/load, merges outputs."""

    attributes = ["tokenizer"]

    def __init__(self, **kwargs):
        for name in self.attributes:
            setattr(self, name, kwargs.pop(name, None))
        for k, v in kwargs.items():
            setattr(self, k, v)

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, **kwargs) -> "ProcessorMixin":
        parts: dict[str, Any] = {}
        for name in cls.attributes:
            if name.endswith("tokenizer"):
                # "tokenizer", "qformer_tokenizer", "char_tokenizer", ... —
                # prefixed tokenizers load from a same-named subfolder when
                # present (reference processing_utils.py sub-processor
                # resolution), else from the repo root
                from .tokenization import AutoTokenizer

                path = pretrained_model_name_or_path
                if name != "tokenizer":
                    sub = os.path.join(str(path), name[: -len("_tokenizer")])
                    if os.path.isdir(sub):
                        path = sub
                parts[name] = AutoTokenizer.from_pretrained(path)
            elif name == "image_processor":
                from .models.auto.image_processing_auto import AutoImageProcessor

                parts[name] = AutoImageProcessor.from_pretrained(pretrained_model_name_or_path)
            elif name == "feature_extractor":
                from .feature_extraction_utils import AutoFeatureExtractor

                parts[name] = AutoFeatureExtractor.from_pretrained(pretrained_model_name_or_path)
            elif name == "video_processor":
                from .models.auto.video_processing_auto import AutoVideoProcessor

                try:
                    parts[name] = AutoVideoProcessor.from_pretrained(pretrained_model_name_or_path)
                except Exception:  # noqa: BLE001 — older repos ship no video config
                    parts[name] = None
        extra = {}
        try:
            from .utils.hub import cached_file

            resolved = cached_file(str(pretrained_model_name_or_path), PROCESSOR_NAME,
                                   _raise_exceptions_for_missing_entries=False)
            if resolved:
                with open(resolved, encoding="utf-8") as f:
                    extra = json.load(f)
                extra.pop("processor_class", None)
        except Exception:  # noqa: BLE001
            pass
        extra.update(kwargs)
        return cls(**parts, **extra)

    def save_pretrained(self, save_directory) -> None:
        os.makedirs(save_directory, exist_ok=True)
        for name in self.attributes:
            sub = getattr(self, name, None)
            if sub is not None and hasattr(sub, "save_pretrained"):
                target = save_directory
                if name.endswith("_tokenizer"):  # prefixed tokenizers nest
                    target = os.path.join(save_directory, name[: -len("_tokenizer")])
                sub.save_pretrained(target)
        extra = {k: v for k, v in self.__dict__.items()
                 if k not in self.attributes and not k.startswith("_")
                 and isinstance(v, (int, float, str, bool, list, dict, type(None)))}
        extra["processor_class"] = type(self).__name__
        with open(os.path.join(save_directory, PROCESSOR_NAME), "w", encoding="utf-8") as f:
            json.dump(extra, f, indent=2, sort_keys=True)

    @staticmethod
    def expand_mm_tokens(texts, replacements_by_token: dict[str, list]) -> list:
        """Replace the i-th occurrence of each placeholder token (in order
        across the batch) with the i-th replacement string (reference
        processing_utils.py:815 ``get_text_with_replacements`` semantics)."""
        import re

        iters = {tok: iter(reps) for tok, reps in replacements_by_token.items()
                 if reps}
        if not iters:
            return list(texts)
        pattern = "|".join(re.escape(t) for t in iters)
        out = []
        for t in texts:
            out.append(re.sub(pattern, lambda m: next(iters[m.group(0)]), t))
        return out

    def batch_decode(self, *args, **kwargs):
        return self.tokenizer.batch_decode(*args, **kwargs)

    def decode(self, *args, **kwargs):
        return self.tokenizer.decode(*args, **kwargs)

    def apply_chat_template(self, conversation, **kwargs):
        """Chat templating with media placeholders left to __call__
        (reference processing_utils.py:1976)."""
        return self.tokenizer.apply_chat_template(conversation, **kwargs)

    def __call__(self, text=None, images=None, audio=None, return_tensors="jax", **kwargs) -> BatchFeature:
        data: dict[str, Any] = {}
        if images is not None and getattr(self, "image_processor", None) is not None:
            data.update(self.image_processor(images, return_tensors=return_tensors))
        if audio is not None and getattr(self, "feature_extractor", None) is not None:
            data.update(self.feature_extractor(audio, return_tensors=return_tensors, **kwargs))
        if text is not None and self.tokenizer is not None:
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       **{k: v for k, v in kwargs.items()
                                          if k in ("padding", "truncation", "max_length",
                                                   "add_special_tokens", "pad_to_multiple_of")}))
        return BatchFeature(data)
