"""AutoTokenizer (reference models/auto/tokenization_auto.py).

All tokenizer.json checkpoints share one engine, so AutoTokenizer is thin:
it loads the engine + config; model-type-specific subclasses are only needed
for exotic behaviors.
"""

from __future__ import annotations

from .base import PreTrainedTokenizer


class AutoTokenizer:
    def __init__(self):
        raise OSError("Use AutoTokenizer.from_pretrained(...)")

    @classmethod
    def from_pretrained(cls, path_or_repo, **kwargs) -> PreTrainedTokenizer:
        return PreTrainedTokenizer.from_pretrained(path_or_repo, **kwargs)
