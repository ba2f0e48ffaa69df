"""Jais-2 config (reference src/transformers/models/jais2/modular_jais2.py)."""

from __future__ import annotations

from ..llama.configuration_llama import LlamaConfig


class Jais2Config(LlamaConfig):
    model_type = "jais2"

    def __init__(self, vocab_size=150272, hidden_size=3328, intermediate_size=26624,
                 num_attention_heads=26, hidden_act="relu2",
                 max_position_embeddings=8192, layer_norm_eps=1e-5,
                 bos_token_id=0, eos_token_id=150024, attention_bias=True,
                 mlp_bias=True, **kwargs):
        self.layer_norm_eps = layer_norm_eps
        super().__init__(vocab_size=vocab_size, hidden_size=hidden_size,
                         intermediate_size=intermediate_size,
                         num_attention_heads=num_attention_heads,
                         hidden_act=hidden_act,
                         max_position_embeddings=max_position_embeddings,
                         bos_token_id=bos_token_id, eos_token_id=eos_token_id,
                         attention_bias=attention_bias, mlp_bias=mlp_bias,
                         **kwargs)
