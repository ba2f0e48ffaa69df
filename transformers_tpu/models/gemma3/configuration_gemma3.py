"""Gemma3 text config (reference models/gemma3/configuration_gemma3.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Gemma3TextConfig(PretrainedConfig):
    model_type = "gemma3_text"

    def __init__(
        self,
        vocab_size=262208,
        hidden_size=2304,
        intermediate_size=9216,
        num_hidden_layers=26,
        num_attention_heads=8,
        num_key_value_heads=4,
        head_dim=256,
        hidden_activation="gelu_pytorch_tanh",
        max_position_embeddings=131072,
        initializer_range=0.02,
        rms_norm_eps=1e-6,
        use_cache=True,
        pad_token_id=0,
        eos_token_id=1,
        bos_token_id=2,
        tie_word_embeddings=True,
        rope_theta=1_000_000.0,
        rope_scaling=None,
        rope_local_base_freq=10_000.0,
        attention_bias=False,
        attention_dropout=0.0,
        query_pre_attn_scalar=256,
        sliding_window=4096,
        layer_types=None,
        sliding_window_pattern=6,
        final_logit_softcapping=None,
        attn_logit_softcapping=None,
        **kwargs,
    ):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.head_dim = head_dim
        self.hidden_activation = hidden_activation
        self.hidden_act = hidden_activation
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
        self.rope_local_base_freq = rope_local_base_freq
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.query_pre_attn_scalar = query_pre_attn_scalar
        self.sliding_window = sliding_window
        self.sliding_window_pattern = sliding_window_pattern
        # every Nth layer is global (reference layer_types default)
        self.layer_types = layer_types or [
            "sliding_attention" if bool((i + 1) % sliding_window_pattern) else "full_attention"
            for i in range(num_hidden_layers)
        ]
        self.final_logit_softcapping = final_logit_softcapping
        self.attn_logit_softcapping = attn_logit_softcapping
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, tie_word_embeddings=tie_word_embeddings,
                         **kwargs)


class Gemma3Config(PretrainedConfig):
    """Multimodal Gemma3 (reference configuration_gemma3.py:159): SigLIP
    vision tower + Gemma3 text decoder + avg-pool projector."""

    model_type = "gemma3"
    sub_configs = {"text_config": "auto", "vision_config": "auto"}
    attribute_map = {
        "image_token_id": "image_token_index",
        "boi_token_id": "boi_token_index",
        "eoi_token_id": "eoi_token_index",
    }

    def __init__(
        self,
        text_config=None,
        vision_config=None,
        mm_tokens_per_image=256,
        boi_token_index=255_999,
        eoi_token_index=256_000,
        image_token_index=262_144,
        initializer_range=0.02,
        **kwargs,
    ):
        from ..auto.configuration_auto import AutoConfig

        if isinstance(text_config, dict):
            text_config = AutoConfig.for_model_type(
                text_config.get("model_type", "gemma3_text"),
                **{k: v for k, v in text_config.items() if k != "model_type"})
        elif text_config is None:
            text_config = Gemma3TextConfig()
        if isinstance(vision_config, dict):
            vision_config = AutoConfig.for_model_type(
                vision_config.get("model_type", "siglip_vision_model"),
                **{k: v for k, v in vision_config.items() if k != "model_type"})
        elif vision_config is None:
            from ..siglip.configuration_siglip import SiglipVisionConfig

            vision_config = SiglipVisionConfig()
        self.text_config = text_config
        self.vision_config = vision_config
        self.mm_tokens_per_image = mm_tokens_per_image
        self.boi_token_index = boi_token_index
        self.eoi_token_index = eoi_token_index
        self.image_token_index = image_token_index
        self.initializer_range = initializer_range
        super().__init__(**kwargs)
