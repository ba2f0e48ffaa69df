"""OLMoE config (reference src/transformers/models/olmoe/configuration_olmoe.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class OlmoeConfig(PretrainedConfig):
    model_type = "olmoe"

    def __init__(self, vocab_size=50304, hidden_size=2048, intermediate_size=2048,
                 num_hidden_layers=16, num_attention_heads=16, num_key_value_heads=None,
                 hidden_act="silu", max_position_embeddings=4096, initializer_range=0.02,
                 rms_norm_eps=1e-5, use_cache=True, pad_token_id=1, bos_token_id=None,
                 eos_token_id=50279, tie_word_embeddings=False, rope_theta=10000.0,
                 attention_bias=False, attention_dropout=0.0, clip_qkv=None,
                 num_experts_per_tok=8, num_experts=64, output_router_logits=False,
                 router_aux_loss_coef=0.01, norm_topk_prob=False, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads or num_attention_heads
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.clip_qkv = clip_qkv
        self.num_experts_per_tok = num_experts_per_tok
        self.num_experts = num_experts
        self.output_router_logits = output_router_logits
        self.router_aux_loss_coef = router_aux_loss_coef
        self.norm_topk_prob = norm_topk_prob
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, tie_word_embeddings=tie_word_embeddings,
                         **kwargs)
