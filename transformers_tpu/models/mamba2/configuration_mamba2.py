"""Mamba2 config (reference src/transformers/models/mamba2/configuration_mamba2.py)."""

from __future__ import annotations

import math

from ...configuration_utils import PretrainedConfig


class Mamba2Config(PretrainedConfig):
    model_type = "mamba2"

    def __init__(self, num_heads=128, head_dim=64, vocab_size=32768, hidden_size=4096,
                 state_size=128, num_hidden_layers=64, layer_norm_epsilon=1e-5,
                 pad_token_id=1, bos_token_id=0, eos_token_id=2, expand=2, conv_kernel=4,
                 n_groups=8, use_bias=False, use_conv_bias=True, hidden_act="silu",
                 initializer_range=0.1, residual_in_fp32=True, time_step_rank="auto",
                 time_step_min=0.001, time_step_max=0.1, time_step_floor=1e-4,
                 time_step_limit=(0.0, float("inf")), rescale_prenorm_residual=False,
                 use_cache=True, chunk_size=256, tie_word_embeddings=False, **kwargs):
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.state_size = state_size
        self.num_hidden_layers = num_hidden_layers
        self.layer_norm_epsilon = layer_norm_epsilon
        self.expand = expand
        self.conv_kernel = conv_kernel
        self.n_groups = n_groups
        self.use_bias = use_bias
        self.use_conv_bias = use_conv_bias
        self.hidden_act = hidden_act
        self.initializer_range = initializer_range
        self.residual_in_fp32 = residual_in_fp32
        self.time_step_rank = (math.ceil(hidden_size / 16) if time_step_rank == "auto"
                               else time_step_rank)
        self.time_step_min = time_step_min
        self.time_step_max = time_step_max
        self.time_step_floor = time_step_floor
        self.time_step_limit = tuple(time_step_limit)
        self.rescale_prenorm_residual = rescale_prenorm_residual
        self.use_cache = use_cache
        self.chunk_size = chunk_size
        self.intermediate_size = int(expand * hidden_size)
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, tie_word_embeddings=tie_word_embeddings,
                         **kwargs)
