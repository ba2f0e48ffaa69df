"""Seed-OSS config (reference src/transformers/models/seed_oss/configuration_seed_oss.py)."""

from __future__ import annotations

from ..llama.configuration_llama import LlamaConfig


class SeedOssConfig(LlamaConfig):
    model_type = "seed_oss"

    def __init__(self, attention_bias=True, attention_out_bias=False, head_dim=128,
                 **kwargs):
        self.attention_out_bias = attention_out_bias
        kwargs["attention_bias"] = attention_bias
        kwargs["head_dim"] = head_dim
        super().__init__(**kwargs)
