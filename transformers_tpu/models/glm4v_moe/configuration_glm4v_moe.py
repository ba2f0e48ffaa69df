"""GLM-4.5V (MoE) configs (reference
src/transformers/models/glm4v_moe/configuration_glm4v_moe.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..glm4v.configuration_glm4v import Glm4vVisionConfig


class Glm4vMoeVisionConfig(Glm4vVisionConfig):
    model_type = "glm4v_moe"


class Glm4vMoeTextConfig(PretrainedConfig):
    """DeepSeek-style sigmoid group-limited MoE text stack with partial (0.5)
    concat-layout M-RoPE (reference Glm4vMoeTextConfig)."""

    model_type = "glm4v_moe_text"
    attribute_map = {"num_local_experts": "n_routed_experts"}

    def __init__(self, vocab_size=151424, hidden_size=4096, intermediate_size=10944,
                 num_hidden_layers=46, num_attention_heads=96, num_key_value_heads=8,
                 partial_rotary_factor=0.5, head_dim=128, hidden_act="silu",
                 max_position_embeddings=65536, initializer_range=0.02,
                 rms_norm_eps=1e-5, use_cache=True, tie_word_embeddings=False,
                 rope_theta=10000.0, rope_scaling=None, attention_bias=True,
                 attention_dropout=0.0, moe_intermediate_size=1408,
                 num_experts_per_tok=8, n_shared_experts=1, n_routed_experts=128,
                 routed_scaling_factor=1.0, n_group=1, topk_group=1,
                 first_k_dense_replace=1, norm_topk_prob=True,
                 router_aux_loss_coef=0.0001, pad_token_id=None,
                 bos_token_id=None, eos_token_id=None, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.partial_rotary_factor = partial_rotary_factor
        self.head_dim = head_dim
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        if rope_scaling is None:
            rope_scaling = {"rope_type": "default", "mrope_section": [8, 12, 12]}
        self.rope_scaling = rope_scaling
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.moe_intermediate_size = moe_intermediate_size
        self.num_experts_per_tok = num_experts_per_tok
        self.n_shared_experts = n_shared_experts
        self.n_routed_experts = n_routed_experts
        self.routed_scaling_factor = routed_scaling_factor
        self.n_group = n_group
        self.topk_group = topk_group
        self.first_k_dense_replace = first_k_dense_replace
        self.norm_topk_prob = norm_topk_prob
        self.router_aux_loss_coef = router_aux_loss_coef
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)

    @property
    def mrope_section(self):
        return (self.rope_scaling or {}).get("mrope_section", [8, 12, 12])


class Glm4vMoeConfig(PretrainedConfig):
    model_type = "glm4v_moe"
    sub_configs = {"text_config": "auto", "vision_config": "auto"}

    def __init__(self, text_config=None, vision_config=None, image_token_id=151363,
                 video_token_id=151364, image_start_token_id=151339,
                 image_end_token_id=151340, video_start_token_id=151341,
                 video_end_token_id=151342, tie_word_embeddings=False, **kwargs):
        if isinstance(vision_config, dict):
            vision_config = Glm4vMoeVisionConfig(
                **{k: v for k, v in vision_config.items() if k != "model_type"})
        elif vision_config is None:
            vision_config = Glm4vMoeVisionConfig()
        if isinstance(text_config, dict):
            text_config = Glm4vMoeTextConfig(
                **{k: v for k, v in text_config.items() if k != "model_type"})
        elif text_config is None:
            text_config = Glm4vMoeTextConfig()
        self.vision_config = vision_config
        self.text_config = text_config
        self.image_token_id = image_token_id
        self.video_token_id = video_token_id
        self.image_start_token_id = image_start_token_id
        self.image_end_token_id = image_end_token_id
        self.video_start_token_id = video_start_token_id
        self.video_end_token_id = video_end_token_id
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)
