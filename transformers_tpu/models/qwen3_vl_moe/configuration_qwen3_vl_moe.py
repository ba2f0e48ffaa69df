"""Qwen3-VL-MoE configs (reference
src/transformers/models/qwen3_vl_moe/configuration_qwen3_vl_moe.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..qwen3_vl.configuration_qwen3_vl import Qwen3VLVisionConfig


class Qwen3VLMoeTextConfig(PretrainedConfig):
    model_type = "qwen3_vl_moe_text"

    def __init__(self, vocab_size=151936, hidden_size=2048, intermediate_size=5632,
                 num_hidden_layers=24, num_attention_heads=32, num_key_value_heads=4,
                 head_dim=128, hidden_act="silu", max_position_embeddings=128000,
                 initializer_range=0.02, rms_norm_eps=1e-6, use_cache=True,
                 tie_word_embeddings=False, rope_theta=5000000.0, rope_scaling=None,
                 attention_bias=False, attention_dropout=0.0,
                 decoder_sparse_step=1, moe_intermediate_size=1408, num_experts=60,
                 num_experts_per_tok=4, norm_topk_prob=True, mlp_only_layers=None,
                 router_aux_loss_coef=0.001, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.head_dim = head_dim
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        if rope_scaling is None:
            rope_scaling = {"rope_type": "default", "mrope_section": [24, 20, 20],
                            "mrope_interleaved": True}
        self.rope_scaling = rope_scaling
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.decoder_sparse_step = decoder_sparse_step
        self.moe_intermediate_size = moe_intermediate_size
        self.num_experts = num_experts
        self.num_experts_per_tok = num_experts_per_tok
        self.norm_topk_prob = norm_topk_prob
        self.mlp_only_layers = mlp_only_layers if mlp_only_layers is not None else []
        self.router_aux_loss_coef = router_aux_loss_coef
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)

    @property
    def mrope_section(self):
        return (self.rope_scaling or {}).get("mrope_section", [24, 20, 20])


class Qwen3VLMoeConfig(PretrainedConfig):
    model_type = "qwen3_vl_moe"
    sub_configs = {"text_config": "auto", "vision_config": "auto"}

    def __init__(self, text_config=None, vision_config=None, image_token_id=151655,
                 video_token_id=151656, vision_start_token_id=151652,
                 vision_end_token_id=151653, tie_word_embeddings=False, **kwargs):
        if isinstance(vision_config, dict):
            vision_config = Qwen3VLVisionConfig(
                **{k: v for k, v in vision_config.items() if k != "model_type"})
        elif vision_config is None:
            vision_config = Qwen3VLVisionConfig()
        if isinstance(text_config, dict):
            text_config = Qwen3VLMoeTextConfig(
                **{k: v for k, v in text_config.items() if k != "model_type"})
        elif text_config is None:
            text_config = Qwen3VLMoeTextConfig()
        self.vision_config = vision_config
        self.text_config = text_config
        self.image_token_id = image_token_id
        self.video_token_id = video_token_id
        self.vision_start_token_id = vision_start_token_id
        self.vision_end_token_id = vision_end_token_id
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)
