"""DBRX config (reference src/transformers/models/dbrx/configuration_dbrx.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class DbrxAttentionConfig:
    def __init__(self, attn_pdrop=0.0, clip_qkv=None, kv_n_heads=1, rope_theta=10000.0,
                 **kwargs):
        self.attn_pdrop = attn_pdrop
        self.clip_qkv = clip_qkv
        self.kv_n_heads = kv_n_heads
        self.rope_theta = rope_theta

    def to_dict(self):
        return dict(self.__dict__)


class DbrxFFNConfig:
    def __init__(self, ffn_act_fn=None, ffn_hidden_size=3584, moe_num_experts=4,
                 moe_top_k=1, moe_jitter_eps=None, moe_loss_weight=0.01,
                 moe_normalize_expert_weights=1.0, **kwargs):
        self.ffn_act_fn = ffn_act_fn or {"name": "silu"}
        self.ffn_hidden_size = ffn_hidden_size
        self.moe_num_experts = moe_num_experts
        self.moe_top_k = moe_top_k
        self.moe_jitter_eps = moe_jitter_eps
        self.moe_loss_weight = moe_loss_weight
        self.moe_normalize_expert_weights = moe_normalize_expert_weights

    def to_dict(self):
        return dict(self.__dict__)


class DbrxConfig(PretrainedConfig):
    model_type = "dbrx"
    attribute_map = {"num_attention_heads": "n_heads", "hidden_size": "d_model",
                     "num_hidden_layers": "n_layers",
                     "max_position_embeddings": "max_seq_len"}

    def __init__(self, d_model=2048, n_heads=16, n_layers=24, max_seq_len=2048,
                 vocab_size=32000, resid_pdrop=0.0, emb_pdrop=0.0, attn_config=None,
                 ffn_config=None, use_cache=True, initializer_range=0.02,
                 output_router_logits=False, **kwargs):
        if attn_config is None:
            attn_config = DbrxAttentionConfig()
        elif isinstance(attn_config, dict):
            attn_config = DbrxAttentionConfig(**attn_config)
        if ffn_config is None:
            ffn_config = DbrxFFNConfig()
        elif isinstance(ffn_config, dict):
            ffn_config = DbrxFFNConfig(**ffn_config)
        self.d_model = d_model
        self.n_heads = n_heads
        self.n_layers = n_layers
        self.max_seq_len = max_seq_len
        self.vocab_size = vocab_size
        self.resid_pdrop = resid_pdrop
        self.emb_pdrop = emb_pdrop
        self.attn_config = attn_config
        self.ffn_config = ffn_config
        self.use_cache = use_cache
        self.initializer_range = initializer_range
        self.output_router_logits = output_router_logits
        self.rope_theta = attn_config.rope_theta
        kwargs.setdefault("tie_word_embeddings", False)
        super().__init__(**kwargs)

    def to_dict(self):
        out = super().to_dict()
        for key in ("attn_config", "ffn_config"):
            if hasattr(out.get(key), "to_dict"):
                out[key] = out[key].to_dict()
        return out
