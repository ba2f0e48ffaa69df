"""FalconH1 config (reference src/transformers/models/falcon_h1/configuration_falcon_h1.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class FalconH1Config(PretrainedConfig):
    model_type = "falcon_h1"

    def __init__(self, vocab_size=128000, tie_word_embeddings=False, hidden_size=4096,
                 intermediate_size=14336, num_hidden_layers=32, num_attention_heads=32,
                 num_key_value_heads=8, hidden_act="silu", initializer_range=0.02,
                 rms_norm_eps=1e-5, use_cache=True, num_logits_to_keep=1,
                 pad_token_id=0, bos_token_id=1, eos_token_id=2,
                 max_position_embeddings=8192, attention_dropout=0.0,
                 mamba_d_ssm=1024, mamba_n_heads=128, mamba_d_head="auto",
                 mamba_n_groups=1, mamba_d_state=256, mamba_d_conv=4, mamba_expand=2,
                 mamba_chunk_size=256, mamba_conv_bias=True, mamba_proj_bias=False,
                 mamba_norm_before_gate=True, mamba_rms_norm=False,
                 projectors_bias=False, rope_theta=100000.0, rope_scaling=None,
                 lm_head_multiplier=1.0, embedding_multiplier=1.0,
                 mlp_multipliers=None, key_multiplier=None,
                 attention_out_multiplier=None, attention_in_multiplier=None,
                 ssm_multipliers=None, ssm_in_multiplier=None, ssm_out_multiplier=None,
                 **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads or num_attention_heads
        self.hidden_act = hidden_act
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.num_logits_to_keep = num_logits_to_keep
        self.max_position_embeddings = max_position_embeddings
        self.attention_dropout = attention_dropout
        self.attention_bias = False
        self.mlp_bias = False
        self.mamba_d_ssm = mamba_d_ssm
        self.mamba_n_heads = mamba_n_heads
        inter = mamba_d_ssm if mamba_d_ssm is not None else int(mamba_expand * hidden_size)
        self.mamba_d_head = inter // mamba_n_heads if mamba_d_head == "auto" else mamba_d_head
        self.mamba_n_groups = mamba_n_groups
        self.mamba_d_state = mamba_d_state
        self.mamba_d_conv = mamba_d_conv
        self.mamba_expand = mamba_expand
        self.mamba_chunk_size = mamba_chunk_size
        self.mamba_conv_bias = mamba_conv_bias
        self.mamba_proj_bias = mamba_proj_bias
        self.mamba_norm_before_gate = mamba_norm_before_gate
        self.mamba_rms_norm = mamba_rms_norm
        self.projectors_bias = projectors_bias
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
        self.lm_head_multiplier = lm_head_multiplier
        self.embedding_multiplier = embedding_multiplier
        self.mlp_multipliers = mlp_multipliers if mlp_multipliers is not None else [1.0, 1.0]
        self.key_multiplier = key_multiplier if key_multiplier is not None else 1.0
        self.attention_out_multiplier = (attention_out_multiplier
                                         if attention_out_multiplier is not None else 1.0)
        self.attention_in_multiplier = (attention_in_multiplier
                                        if attention_in_multiplier is not None else 1.0)
        self.ssm_multipliers = (ssm_multipliers if ssm_multipliers is not None
                                else [1.0] * 5)
        self.ssm_in_multiplier = ssm_in_multiplier if ssm_in_multiplier is not None else 1.0
        self.ssm_out_multiplier = ssm_out_multiplier if ssm_out_multiplier is not None else 1.0
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, tie_word_embeddings=tie_word_embeddings,
                         **kwargs)
