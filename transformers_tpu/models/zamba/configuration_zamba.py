"""Zamba config (reference src/transformers/models/zamba/configuration_zamba.py)."""

from __future__ import annotations

import math

from ...configuration_utils import PretrainedConfig


class ZambaConfig(PretrainedConfig):
    model_type = "zamba"

    def __init__(self, vocab_size=32000, tie_word_embeddings=True, hidden_size=3712,
                 attention_hidden_size=None, intermediate_size=14848,
                 num_hidden_layers=76, num_attention_heads=16,
                 attention_head_dim=None, num_key_value_heads=16, n_mamba_heads=2,
                 hidden_act="gelu", hidden_mamba_act="silu", initializer_range=0.02,
                 rms_norm_eps=1e-5, use_cache=True, num_logits_to_keep=1,
                 pad_token_id=0, bos_token_id=1, eos_token_id=2,
                 max_position_embeddings=4096, attention_dropout=0.0,
                 attn_layer_period=6, attn_layer_offset=4, use_mamba_kernels=True,
                 mamba_d_state=16, mamba_d_conv=4, mamba_expand=2,
                 mamba_dt_rank="auto", time_step_min=0.001, time_step_max=0.1,
                 time_step_floor=1e-4, mamba_conv_bias=True, mamba_proj_bias=False,
                 **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.attention_hidden_size = (2 * hidden_size if attention_hidden_size is None
                                      else attention_hidden_size)
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.attention_head_dim = (self.attention_hidden_size // num_attention_heads
                                   if attention_head_dim is None else attention_head_dim)
        self.num_key_value_heads = num_key_value_heads
        self.n_mamba_heads = n_mamba_heads
        self.hidden_act = hidden_act
        self.hidden_mamba_act = hidden_mamba_act
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.num_logits_to_keep = num_logits_to_keep
        self.max_position_embeddings = max_position_embeddings
        self.attention_dropout = attention_dropout
        self.attn_layer_period = attn_layer_period
        self.attn_layer_offset = attn_layer_offset
        self.use_mamba_kernels = use_mamba_kernels
        self.mamba_d_state = mamba_d_state
        self.mamba_d_conv = mamba_d_conv
        self.mamba_expand = mamba_expand
        self.mamba_dt_rank = (math.ceil(hidden_size / 16) if mamba_dt_rank == "auto"
                              else mamba_dt_rank)
        self.time_step_min = time_step_min
        self.time_step_max = time_step_max
        self.time_step_floor = time_step_floor
        self.mamba_conv_bias = mamba_conv_bias
        self.mamba_proj_bias = mamba_proj_bias
        self.head_dim = self.attention_head_dim  # LlamaAttention contract
        kwargs.pop("layers_block_type", None)
        self.layers_block_type = [
            "hybrid" if i % attn_layer_period == attn_layer_offset else "mamba"
            for i in range(num_hidden_layers)]
        self.layer_types = list(self.layers_block_type)
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)
