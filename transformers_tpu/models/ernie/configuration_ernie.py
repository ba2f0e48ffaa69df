"""ERNIE 1.0-3.0 config (reference src/transformers/models/ernie/configuration_ernie.py)."""

from __future__ import annotations

from ..bert.configuration_bert import BertConfig


class ErnieConfig(BertConfig):
    model_type = "ernie"

    def __init__(self, use_task_id=False, task_type_vocab_size=3, **kwargs):
        super().__init__(**kwargs)
        self.use_task_id = use_task_id
        self.task_type_vocab_size = task_type_vocab_size
