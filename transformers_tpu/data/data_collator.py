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


@dataclass
class DataCollatorWithFlattening:
    """Packed-sequence (padding-free) collator: concatenate every example in
    the batch into ONE row, with ``position_ids`` restarting at 0 at each
    example boundary (reference data_collator.py DataCollatorWithFlattening).

    The model detects the packed layout from the position resets and builds a
    block-diagonal causal mask (ops/masks.py segment_ids_from_position_ids),
    so no cross-example attention happens. The first token of each example
    gets ``separator_id`` (-100) as its label — its target belongs to the
    previous example.

    TPU addition: ``pad_to_multiple_of`` pads the packed row to a static
    length bucket; pad slots restart positions at 0, forming their own
    segment, and carry -100 labels.
    """

    return_position_ids: bool = True
    separator_id: int = -100
    return_seq_idx: bool = False
    pad_to_multiple_of: Optional[int] = None
    pad_token_id: int = 0

    def __call__(self, features: list[dict]) -> dict:
        ids, pos, labels, seq_idx = [], [], [], []
        for i, f in enumerate(features):
            ex = list(f["input_ids"])
            lab = list(f.get("labels", f["input_ids"]))
            ids.extend(ex)
            labels.append(self.separator_id)
            labels.extend(lab[1:])
            pos.extend(range(len(ex)))
            seq_idx.extend([i] * len(ex))
        if self.pad_to_multiple_of:
            m = self.pad_to_multiple_of
            pad = (-len(ids)) % m
            for p in range(pad):
                ids.append(self.pad_token_id)
                labels.append(-100)
                pos.append(0 if p == 0 else pos[-1] + 1)
                seq_idx.append(len(features))
        out = {
            "input_ids": np.asarray([ids], np.int64),
            "labels": np.asarray([labels], np.int64),
        }
        if self.return_position_ids:
            out["position_ids"] = np.asarray([pos], np.int64)
        if self.return_seq_idx:
            out["seq_idx"] = np.asarray([seq_idx], np.int64)
        return out


@dataclass
class DataCollatorForWholeWordMask:
    """Whole-word masking (reference data_collator.py:997
    DataCollatorForWholeWordMask): mask every wordpiece of a sampled word
    together (BERT-style '##' continuation convention)."""

    tokenizer: Any
    mlm_probability: float = 0.15
    pad_to_multiple_of: Optional[int] = None
    seed: Optional[int] = None

    def __post_init__(self):
        if self.tokenizer.mask_token_id is None:
            raise ValueError("Whole-word masking requires a mask token")
        self._rng = np.random.default_rng(self.seed)

    def _word_starts(self, tokens: list[str]) -> list[list[int]]:
        words, current = [], []
        special = set(self.tokenizer.all_special_tokens)
        for i, tok in enumerate(tokens):
            if tok in special:
                current = []
                continue
            if tok.startswith("##") and current:
                current.append(i)
            else:
                current = [i]
                words.append(current)
        return words

    def __call__(self, features: list) -> dict:
        batch = self.tokenizer.pad(features, padding=True,
                                   pad_to_multiple_of=self.pad_to_multiple_of,
                                   return_tensors="np")
        input_ids = np.asarray(batch["input_ids"]).copy()
        labels = np.full(input_ids.shape, -100, np.int64)
        for row in range(input_ids.shape[0]):
            tokens = self.tokenizer.convert_ids_to_tokens(list(input_ids[row]))
            words = self._word_starts(tokens)
            if not words:
                continue
            self._rng.shuffle(words)
            budget = max(1, int(round(sum(len(w) for w in words) * self.mlm_probability)))
            covered = 0
            for word in words:
                if covered >= budget:
                    break
                for i in word:
                    labels[row, i] = input_ids[row, i]
                    input_ids[row, i] = self.tokenizer.mask_token_id
                covered += len(word)
        out = {"input_ids": input_ids, "labels": labels}
        if "attention_mask" in batch:
            out["attention_mask"] = np.asarray(batch["attention_mask"])
        return out
