"""DiffLlama config (reference src/transformers/models/diffllama/configuration_diffllama.py)."""

from __future__ import annotations

from ..llama.configuration_llama import LlamaConfig


class DiffLlamaConfig(LlamaConfig):
    model_type = "diffllama"

    def __init__(self, lambda_std_dev=0.1, **kwargs):
        super().__init__(**kwargs)
        self.lambda_std_dev = lambda_std_dev
