"""Idefics (v1) configs (reference models/idefics/configuration_idefics.py):
Flamingo-style gated cross-attention over a CLIP vision tower, optional
perceiver resampler, decoupled (additional-vocab) embeddings."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class IdeficsVisionConfig(PretrainedConfig):
    model_type = "idefics_vision"

    def __init__(self, embed_dim=768, image_size=224, intermediate_size=5120,
                 patch_size=14, num_hidden_layers=32, num_attention_heads=16,
                 num_channels=3, hidden_act="gelu", layer_norm_eps=1e-5,
                 attention_dropout=0.0, initializer_range=0.02,
                 initializer_factor=1.0, **kwargs):
        self.embed_dim = embed_dim
        self.hidden_size = embed_dim  # CLIP-tower modules read hidden_size
        self.image_size = image_size
        self.intermediate_size = intermediate_size
        self.patch_size = patch_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_channels = num_channels
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.attention_dropout = attention_dropout
        self.initializer_range = initializer_range
        self.initializer_factor = initializer_factor
        kwargs.pop("hidden_size", None)
        super().__init__(**kwargs)


class IdeficsPerceiverConfig(PretrainedConfig):
    model_type = "idefics_perciever"  # sic, matches the reference

    def __init__(self, use_resampler=False, resampler_n_latents=64,
                 resampler_depth=6, resampler_n_heads=16, resampler_head_dim=96,
                 qk_layer_norms_perceiver=False, **kwargs):
        self.use_resampler = use_resampler
        self.resampler_n_latents = resampler_n_latents
        self.resampler_depth = resampler_depth
        self.resampler_n_heads = resampler_n_heads
        self.resampler_head_dim = resampler_head_dim
        self.qk_layer_norms_perceiver = qk_layer_norms_perceiver
        super().__init__(**kwargs)


class IdeficsConfig(PretrainedConfig):
    model_type = "idefics"
    sub_configs = {"perceiver_config": IdeficsPerceiverConfig,
                   "vision_config": IdeficsVisionConfig}

    def __init__(self, vocab_size=32000, additional_vocab_size=0,
                 hidden_size=4096, intermediate_size=11008,
                 num_hidden_layers=32, num_attention_heads=32, dropout=0.0,
                 hidden_act="silu", initializer_range=0.02,
                 alpha_initializer="zeros", alphas_initializer_range=0.0,
                 alpha_type="float", rms_norm_eps=1e-6, use_cache=True,
                 pad_token_id=0, bos_token_id=1, eos_token_id=2,
                 tie_word_embeddings=False, cross_layer_interval=1,
                 qk_layer_norms=False, freeze_text_layers=True,
                 freeze_text_module_exceptions=(), freeze_lm_head=False,
                 freeze_vision_layers=True, freeze_vision_module_exceptions=(),
                 use_resampler=False, vision_config=None, perceiver_config=None,
                 max_position_embeddings=2048, **kwargs):
        self.vocab_size = vocab_size
        self.additional_vocab_size = additional_vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_attention_heads  # MHA
        self.dropout = dropout
        self.hidden_act = hidden_act
        self.initializer_range = initializer_range
        self.alpha_initializer = alpha_initializer
        self.alphas_initializer_range = alphas_initializer_range
        self.alpha_type = alpha_type
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.cross_layer_interval = cross_layer_interval
        self.qk_layer_norms = qk_layer_norms
        self.freeze_text_layers = freeze_text_layers
        self.freeze_text_module_exceptions = list(freeze_text_module_exceptions)
        self.freeze_lm_head = freeze_lm_head
        self.freeze_vision_layers = freeze_vision_layers
        self.freeze_vision_module_exceptions = list(freeze_vision_module_exceptions)
        self.use_resampler = use_resampler
        self.max_position_embeddings = max_position_embeddings
        self.rope_theta = 10000.0
        self.attention_bias = False
        self.mlp_bias = False
        if isinstance(vision_config, dict):
            vision_config = IdeficsVisionConfig(**vision_config)
        elif vision_config is None:
            vision_config = IdeficsVisionConfig()
        if isinstance(perceiver_config, dict):
            perceiver_config = IdeficsPerceiverConfig(**perceiver_config)
        elif perceiver_config is None:
            perceiver_config = IdeficsPerceiverConfig()
        self.vision_config = vision_config
        self.perceiver_config = perceiver_config
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)
