"""MegatronBERT config (reference src/transformers/models/megatron_bert/configuration_megatron_bert.py)."""

from __future__ import annotations

from ..bert.configuration_bert import BertConfig


class MegatronBertConfig(BertConfig):
    model_type = "megatron-bert"

    def __init__(self, vocab_size=29056, hidden_size=1024, num_hidden_layers=24,
                 num_attention_heads=16, intermediate_size=4096, **kwargs):
        super().__init__(vocab_size=vocab_size, hidden_size=hidden_size,
                         num_hidden_layers=num_hidden_layers,
                         num_attention_heads=num_attention_heads,
                         intermediate_size=intermediate_size, **kwargs)
