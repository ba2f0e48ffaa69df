"""Voxtral config (reference src/transformers/models/voxtral/configuration_voxtral.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class VoxtralEncoderConfig(PretrainedConfig):
    model_type = "voxtral_encoder"

    attribute_map = {
        "d_model": "hidden_size",
        "encoder_layers": "num_hidden_layers",
        "encoder_attention_heads": "num_attention_heads",
        "encoder_ffn_dim": "intermediate_size",
        "encoder_layerdrop": "layerdrop",
        "init_std": "initializer_range",
    }

    def __init__(self, vocab_size=51866, hidden_size=1280, intermediate_size=5120,
                 num_hidden_layers=32, num_attention_heads=20, scale_embedding=False,
                 activation_function="gelu", num_mel_bins=128,
                 max_source_positions=1500, initializer_range=0.02,
                 attention_dropout=0.0, dropout=0.0, layerdrop=0.0,
                 activation_dropout=0.0, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.scale_embedding = scale_embedding
        self.activation_function = activation_function
        self.num_mel_bins = num_mel_bins
        self.max_source_positions = max_source_positions
        self.initializer_range = initializer_range
        self.attention_dropout = attention_dropout
        self.dropout = dropout
        self.layerdrop = layerdrop
        self.activation_dropout = activation_dropout
        super().__init__(**kwargs)


class VoxtralConfig(PretrainedConfig):
    model_type = "voxtral"
    sub_configs = {"audio_config": VoxtralEncoderConfig, "text_config": "auto"}

    _default_text_config_kwargs = dict(
        vocab_size=131072, hidden_size=3072, intermediate_size=8192,
        num_hidden_layers=30, num_key_value_heads=8,
        max_position_embeddings=131072, rms_norm_eps=1e-05, use_cache=True,
        rope_theta=100000000.0, head_dim=128)

    def __init__(self, audio_config=None, text_config=None, audio_token_id=None,
                 projector_hidden_act="gelu", **kwargs):
        from ..auto.configuration_auto import AutoConfig

        self.audio_config = (VoxtralEncoderConfig(**audio_config)
                             if isinstance(audio_config, dict)
                             else audio_config or VoxtralEncoderConfig())
        if isinstance(text_config, dict):
            mt = text_config.get("model_type", "llama")
            merged = {**self._default_text_config_kwargs,
                      **{k: v for k, v in text_config.items() if k != "model_type"}}
            text_config = AutoConfig.for_model_type(mt, **merged)
        elif text_config is None:
            from ..llama.configuration_llama import LlamaConfig

            text_config = LlamaConfig(**self._default_text_config_kwargs)
        self.text_config = text_config
        self.audio_token_id = audio_token_id
        self.projector_hidden_act = projector_hidden_act
        self.hidden_size = text_config.hidden_size
        super().__init__(**kwargs)
