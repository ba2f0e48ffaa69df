"""Data collators (reference src/transformers/data/data_collator.py:37-1364).

All collators return dicts of numpy arrays (host side); the Trainer moves
them to device with the batch sharding.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np


def default_data_collator(features: list[dict]) -> dict:
    """Stack same-key features (reference data_collator.py default_data_collator)."""
    if not features:
        return {}
    first = features[0]
    batch = {}
    for key, value in first.items():
        if key in ("label", "label_ids"):
            out_key = "labels"
        else:
            out_key = key
        if isinstance(value, str):
            continue
        batch[out_key] = np.stack([np.asarray(f[key]) for f in features])
    return batch


def pad_without_fast_tokenizer_warning(tokenizer, *args, **kwargs):
    return tokenizer.pad(*args, **kwargs)


@dataclass
class DataCollatorWithPadding:
    """Pad to the longest (or multiple) via the tokenizer (reference :271)."""

    tokenizer: Any
    padding: Any = True
    max_length: Optional[int] = None
    pad_to_multiple_of: Optional[int] = None

    def __call__(self, features: list[dict]) -> dict:
        batch = self.tokenizer.pad(
            features, padding=self.padding, max_length=self.max_length,
            pad_to_multiple_of=self.pad_to_multiple_of, return_tensors="np",
        )
        if "label" in batch:
            batch["labels"] = batch.pop("label")
        if "label_ids" in batch:
            batch["labels"] = batch.pop("label_ids")
        return dict(batch)


@dataclass
class DataCollatorForLanguageModeling:
    """MLM masking / CLM label copy (reference :609)."""

    tokenizer: Any
    mlm: bool = True
    mlm_probability: float = 0.15
    pad_to_multiple_of: Optional[int] = None
    seed: Optional[int] = None

    def __post_init__(self):
        if self.mlm and self.tokenizer.mask_token_id is None:
            raise ValueError("MLM requires a tokenizer with a mask token")
        self._rng = np.random.default_rng(self.seed)

    def __call__(self, features: list) -> dict:
        if isinstance(features[0], dict):
            batch = self.tokenizer.pad(features, padding=True,
                                       pad_to_multiple_of=self.pad_to_multiple_of,
                                       return_tensors="np")
            input_ids = np.asarray(batch["input_ids"])
            attention_mask = np.asarray(batch.get("attention_mask"))
        else:
            input_ids = np.stack([np.asarray(f) for f in features])
            attention_mask = np.ones_like(input_ids)
        if self.mlm:
            input_ids = input_ids.copy()
            labels = input_ids.copy()
            special = np.zeros(input_ids.shape, bool)
            for tok in self.tokenizer.all_special_ids:
                special |= input_ids == tok
            prob = np.full(input_ids.shape, self.mlm_probability)
            prob[special] = 0.0
            masked = self._rng.random(input_ids.shape) < prob
            labels[~masked] = -100
            # 80% [MASK], 10% random, 10% keep
            replace = masked & (self._rng.random(input_ids.shape) < 0.8)
            input_ids[replace] = self.tokenizer.mask_token_id
            rand = masked & ~replace & (self._rng.random(input_ids.shape) < 0.5)
            input_ids[rand] = self._rng.integers(0, len(self.tokenizer), rand.sum())
            out = {"input_ids": input_ids, "labels": labels}
        else:
            labels = input_ids.copy()
            if self.tokenizer.pad_token_id is not None:
                labels[labels == self.tokenizer.pad_token_id] = -100
            out = {"input_ids": input_ids, "labels": labels}
        if attention_mask is not None:
            out["attention_mask"] = attention_mask
        return out


@dataclass
class DataCollatorForSeq2Seq:
    """Pad inputs via tokenizer and labels with -100 (reference :543)."""

    tokenizer: Any
    model: Any = None
    padding: Any = True
    max_length: Optional[int] = None
    pad_to_multiple_of: Optional[int] = None
    label_pad_token_id: int = -100

    def __call__(self, features: list[dict]) -> dict:
        labels = [f.pop("labels") for f in features] if "labels" in features[0] else None
        batch = dict(self.tokenizer.pad(features, padding=self.padding, max_length=self.max_length,
                                        pad_to_multiple_of=self.pad_to_multiple_of,
                                        return_tensors="np"))
        if labels is not None:
            max_len = max(len(l) for l in labels)
            if self.pad_to_multiple_of:
                m = self.pad_to_multiple_of
                max_len = ((max_len + m - 1) // m) * m
            padded = np.full((len(labels), max_len), self.label_pad_token_id, np.int64)
            for i, l in enumerate(labels):
                padded[i, : len(l)] = np.asarray(l)
            batch["labels"] = padded
        return batch
