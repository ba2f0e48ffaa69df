"""MiniCPM3 config (reference
src/transformers/models/minicpm3/modular_minicpm3.py)."""

from __future__ import annotations

import math

from ..deepseek_v3.configuration_deepseek_v3 import DeepseekV3Config


class MiniCPM3Config(DeepseekV3Config):
    model_type = "minicpm3"

    def __init__(self, vocab_size=73448, hidden_size=2560, intermediate_size=6400,
                 num_hidden_layers=62, num_attention_heads=40,
                 num_key_value_heads=40, max_position_embeddings=32768,
                 initializer_range=0.1, rms_norm_eps=1e-5,
                 tie_word_embeddings=True, kv_lora_rank=256, q_lora_rank=768,
                 qk_nope_head_dim=64, qk_rope_head_dim=32, v_head_dim=None,
                 scale_emb=12, scale_depth=1.4, dim_model_base=256, **kwargs):
        if v_head_dim is None:
            v_head_dim = hidden_size // num_attention_heads
        self.scale_emb = scale_emb
        self.scale_depth = (scale_depth if scale_depth is not None
                            else math.sqrt(num_hidden_layers))
        self.dim_model_base = dim_model_base if dim_model_base is not None else hidden_size
        # MiniCPM3 keeps the standard cos/sin rotate-half rope, not
        # DeepSeek's interleaved/complex variant
        kwargs.setdefault("rope_interleave", False)
        super().__init__(vocab_size=vocab_size, hidden_size=hidden_size,
                         intermediate_size=intermediate_size,
                         num_hidden_layers=num_hidden_layers,
                         num_attention_heads=num_attention_heads,
                         num_key_value_heads=num_key_value_heads,
                         max_position_embeddings=max_position_embeddings,
                         initializer_range=initializer_range,
                         rms_norm_eps=rms_norm_eps,
                         tie_word_embeddings=tie_word_embeddings,
                         kv_lora_rank=kv_lora_rank, q_lora_rank=q_lora_rank,
                         qk_nope_head_dim=qk_nope_head_dim,
                         qk_rope_head_dim=qk_rope_head_dim,
                         v_head_dim=v_head_dim, **kwargs)

    @property
    def logits_scaling(self) -> float:
        return self.hidden_size / self.dim_model_base
