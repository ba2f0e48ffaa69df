"""Qwen2-Audio config (reference src/transformers/models/qwen2_audio/configuration_qwen2_audio.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Qwen2AudioEncoderConfig(PretrainedConfig):
    model_type = "qwen2_audio_encoder"

    def __init__(self, num_mel_bins=128, encoder_layers=32, encoder_attention_heads=20,
                 encoder_ffn_dim=5120, encoder_layerdrop=0.0, d_model=1280,
                 dropout=0.0, attention_dropout=0.0, activation_function="gelu",
                 activation_dropout=0.0, scale_embedding=False, init_std=0.02,
                 max_source_positions=1500, **kwargs):
        self.num_mel_bins = num_mel_bins
        self.d_model = d_model
        self.encoder_layers = encoder_layers
        self.encoder_attention_heads = encoder_attention_heads
        self.encoder_ffn_dim = encoder_ffn_dim
        self.encoder_layerdrop = encoder_layerdrop
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        self.activation_function = activation_function
        self.activation_dropout = activation_dropout
        self.scale_embedding = scale_embedding
        self.init_std = init_std
        self.max_source_positions = max_source_positions
        super().__init__(**kwargs)


class Qwen2AudioConfig(PretrainedConfig):
    model_type = "qwen2_audio"
    sub_configs = {"audio_config": Qwen2AudioEncoderConfig, "text_config": "auto"}

    def __init__(self, audio_config=None, text_config=None, audio_token_index=151646,
                 **kwargs):
        from ..auto.configuration_auto import AutoConfig

        self.audio_config = (Qwen2AudioEncoderConfig(**audio_config)
                             if isinstance(audio_config, dict)
                             else audio_config or Qwen2AudioEncoderConfig())
        if isinstance(text_config, dict):
            text_config = AutoConfig.for_model_type(
                text_config.get("model_type", "qwen2"),
                **{k: v for k, v in text_config.items() if k != "model_type"})
        elif text_config is None:
            from ..qwen2.configuration_qwen2 import Qwen2Config

            text_config = Qwen2Config()
        self.text_config = text_config
        self.audio_token_index = audio_token_index
        self.audio_token_id = audio_token_index
        super().__init__(**kwargs)
