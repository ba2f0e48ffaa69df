"""Llama4 configs (reference src/transformers/models/llama4/configuration_llama4.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Llama4TextConfig(PretrainedConfig):
    model_type = "llama4_text"

    def __init__(
        self,
        vocab_size=202048,
        hidden_size=5120,
        intermediate_size=8192,
        intermediate_size_mlp=16384,
        num_hidden_layers=48,
        num_attention_heads=40,
        num_key_value_heads=8,
        head_dim=128,
        hidden_act="silu",
        max_position_embeddings=131072,
        initializer_range=0.02,
        rms_norm_eps=1e-5,
        use_cache=True,
        pad_token_id=None,
        bos_token_id=1,
        eos_token_id=2,
        tie_word_embeddings=False,
        rope_theta=500000,
        attention_dropout=0.0,
        attention_bias=False,
        num_experts_per_tok=1,
        num_local_experts=16,
        moe_layers=None,
        interleave_moe_layer_step=1,
        use_qk_norm=True,
        output_router_logits=False,
        router_aux_loss_coef=0.001,
        router_jitter_noise=0.0,
        rope_scaling=None,
        no_rope_layers=None,
        no_rope_layer_interval=4,
        attention_chunk_size=8192,
        layer_types=None,
        attn_temperature_tuning=True,
        floor_scale=8192,
        attn_scale=0.1,
        **kwargs,
    ):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.intermediate_size_mlp = intermediate_size_mlp
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
        self.attention_dropout = attention_dropout
        self.attention_bias = attention_bias
        self.num_experts_per_tok = num_experts_per_tok
        self.num_local_experts = num_local_experts
        self.use_qk_norm = use_qk_norm
        self.output_router_logits = output_router_logits
        self.router_aux_loss_coef = router_aux_loss_coef
        self.router_jitter_noise = router_jitter_noise
        self.rope_scaling = rope_scaling
        self.attn_temperature_tuning = attn_temperature_tuning
        self.floor_scale = floor_scale
        self.attn_scale = attn_scale
        self.no_rope_layer_interval = no_rope_layer_interval
        if not no_rope_layers:
            # value 1 == the layer USES rope (reference naming quirk)
            no_rope_layers = [int((i + 1) % no_rope_layer_interval != 0)
                              for i in range(num_hidden_layers)]
        self.no_rope_layers = no_rope_layers
        self.interleave_moe_layer_step = interleave_moe_layer_step
        self.moe_layers = (moe_layers if moe_layers is not None else
                           list(range(interleave_moe_layer_step - 1,
                                      num_hidden_layers, interleave_moe_layer_step)))
        self.attention_chunk_size = attention_chunk_size
        if layer_types is None:
            layer_types = ["chunked_attention" if r else "full_attention"
                           for r in self.no_rope_layers]
        self.layer_types = layer_types
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)


class Llama4VisionConfig(PretrainedConfig):
    model_type = "llama4_vision_model"

    def __init__(self, hidden_size=768, hidden_act="gelu", num_hidden_layers=34,
                 num_attention_heads=16, num_channels=3, intermediate_size=5632,
                 vision_output_dim=7680, image_size=448, patch_size=14,
                 norm_eps=1e-5, vision_feature_layer=-1,
                 vision_feature_select_strategy="default", initializer_range=0.02,
                 pixel_shuffle_ratio=0.5, projector_input_dim=4096,
                 projector_output_dim=4096, multi_modal_projector_bias=False,
                 projector_dropout=0.0, attention_dropout=0.0,
                 rope_theta=10000, **kwargs):
        self.hidden_size = hidden_size
        self.hidden_act = hidden_act
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_channels = num_channels
        self.intermediate_size = intermediate_size
        self.vision_output_dim = vision_output_dim
        self.image_size = image_size
        self.patch_size = patch_size
        self.norm_eps = norm_eps
        self.vision_feature_layer = vision_feature_layer
        self.vision_feature_select_strategy = vision_feature_select_strategy
        self.initializer_range = initializer_range
        self.pixel_shuffle_ratio = pixel_shuffle_ratio
        self.projector_input_dim = projector_input_dim
        self.projector_output_dim = projector_output_dim
        self.multi_modal_projector_bias = multi_modal_projector_bias
        self.projector_dropout = projector_dropout
        self.attention_dropout = attention_dropout
        self.rope_theta = rope_theta
        super().__init__(**kwargs)


class Llama4Config(PretrainedConfig):
    model_type = "llama4"
    sub_configs = {"text_config": Llama4TextConfig, "vision_config": Llama4VisionConfig}

    def __init__(self, vision_config=None, text_config=None, boi_token_index=200080,
                 eoi_token_index=200081, image_token_index=200092,
                 tie_word_embeddings=False, **kwargs):
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = Llama4VisionConfig(**(vision_config or {}))
        self.vision_config = vision_config
        if isinstance(text_config, dict) or text_config is None:
            text_config = Llama4TextConfig(**(text_config or {}))
        self.text_config = text_config
        self.boi_token_index = boi_token_index
        self.eoi_token_index = eoi_token_index
        self.image_token_index = image_token_index
        self.image_token_id = image_token_index
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)
