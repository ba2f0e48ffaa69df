"""Zamba2 config (reference
src/transformers/models/zamba2/configuration_zamba2.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Zamba2Config(PretrainedConfig):
    model_type = "zamba2"

    def __init__(self, vocab_size=32000, max_position_embeddings=4096,
                 hidden_size=2560, num_hidden_layers=54, layers_block_type=None,
                 mamba_d_state=64, mamba_d_conv=4, mamba_expand=2,
                 mamba_ngroups=1, time_step_min=0.001, time_step_max=0.1,
                 time_step_floor=1e-4, n_mamba_heads=8, use_conv_bias=True,
                 chunk_size=256, add_bias_linear=False, intermediate_size=None,
                 hidden_act="gelu", num_attention_heads=32,
                 num_key_value_heads=None, attention_dropout=0.0,
                 num_mem_blocks=1, use_shared_attention_adapter=False,
                 adapter_rank=128, use_mem_rope=False, rope_theta=10000.0,
                 initializer_range=0.02, rms_norm_eps=1e-5, use_cache=True,
                 pad_token_id=0, bos_token_id=1, eos_token_id=2,
                 use_long_context=False, tie_word_embeddings=True, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.mamba_d_state = mamba_d_state
        self.mamba_d_conv = mamba_d_conv
        self.mamba_expand = mamba_expand
        self.mamba_ngroups = mamba_ngroups
        self.time_step_min = time_step_min
        self.time_step_max = time_step_max
        self.time_step_floor = time_step_floor
        self.n_mamba_heads = n_mamba_heads
        self.use_conv_bias = use_conv_bias
        self.chunk_size = chunk_size
        self.add_bias_linear = add_bias_linear
        self.intermediate_size = intermediate_size or 4 * hidden_size
        self.hidden_act = hidden_act
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads or num_attention_heads
        self.attention_dropout = attention_dropout
        self.num_mem_blocks = num_mem_blocks
        self.use_shared_attention_adapter = use_shared_attention_adapter
        self.adapter_rank = adapter_rank
        self.use_mem_rope = use_mem_rope
        self.rope_theta = rope_theta
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.use_long_context = use_long_context
        # long-context variant rescales theta and extends the window
        # (reference configuration_zamba2.py __post_init__)
        if use_long_context:
            self.max_position_embeddings = 16384
            a = 8
            self.rope_theta = rope_theta * a ** (
                (2 * hidden_size // num_attention_heads)
                / ((2 * hidden_size // num_attention_heads) - 2))
        else:
            self.max_position_embeddings = max_position_embeddings
        self.attention_hidden_size = 2 * hidden_size
        self.attention_head_dim = 2 * hidden_size // num_attention_heads
        # the attention skeleton reads head_dim; zamba heads span 2H
        self.head_dim = self.attention_head_dim
        self.mamba_headdim = int(mamba_expand * hidden_size) // n_mamba_heads
        if layers_block_type is None:
            # default pattern of the Zamba2-1.2B family: hybrid every 6 from 6
            layers_block_type = [
                "hybrid" if (i % 6 == 3 or i == num_hidden_layers - 1) else "mamba"
                for i in range(num_hidden_layers)]
        self.layers_block_type = list(layers_block_type)
        self.hybrid_layer_ids = [i for i, t in enumerate(self.layers_block_type)
                                 if t == "hybrid"]
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)
