"""LongCat-Flash config (reference
models/longcat_flash/configuration_longcat_flash.py): dual-sublayer MLA
blocks with a shortcut MoE that includes zero-computation identity experts."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class LongcatFlashConfig(PretrainedConfig):
    model_type = "longcat_flash"

    def __init__(self, vocab_size=131072, hidden_size=6144, num_layers=28,
                 num_attention_heads=64, num_key_value_heads=None,
                 ffn_hidden_size=12288, q_lora_rank=1536, kv_lora_rank=512,
                 qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
                 qk_head_dim=None, moe_topk=12, n_routed_experts=512,
                 zero_expert_num=256, expert_ffn_hidden_size=2048,
                 routed_scaling_factor=6.0, router_bias=False,
                 max_position_embeddings=131072, rms_norm_eps=1e-5,
                 rope_theta=10000000.0, hidden_act="silu",
                 initializer_range=0.02, attention_bias=False,
                 attention_dropout=0.0, use_cache=True, mlp_bias=False,
                 rope_interleave=True, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        # the torch config carries an independent (unused) num_hidden_layers
        # default; num_layers is authoritative for the layer count
        kwargs.pop("num_hidden_layers", None)
        self.num_hidden_layers = num_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads or num_attention_heads
        self.ffn_hidden_size = ffn_hidden_size
        self.intermediate_size = ffn_hidden_size
        self.q_lora_rank = q_lora_rank
        self.kv_lora_rank = kv_lora_rank
        self.qk_nope_head_dim = qk_nope_head_dim
        self.qk_rope_head_dim = qk_rope_head_dim
        self.v_head_dim = v_head_dim
        self.qk_head_dim = qk_head_dim if qk_head_dim is not None \
            else qk_nope_head_dim + qk_rope_head_dim
        self.head_dim = qk_rope_head_dim  # rope table width
        self.moe_topk = moe_topk
        self.num_experts_per_tok = moe_topk
        self.n_routed_experts = n_routed_experts
        self.zero_expert_num = zero_expert_num
        self.expert_ffn_hidden_size = expert_ffn_hidden_size
        self.routed_scaling_factor = routed_scaling_factor
        self.router_bias = router_bias
        self.max_position_embeddings = max_position_embeddings
        self.rms_norm_eps = rms_norm_eps
        self.rope_theta = rope_theta
        self.hidden_act = hidden_act
        self.initializer_range = initializer_range
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.use_cache = use_cache
        self.mlp_bias = mlp_bias
        self.rope_interleave = rope_interleave
        kwargs.setdefault("tie_word_embeddings", False)
        super().__init__(**kwargs)
