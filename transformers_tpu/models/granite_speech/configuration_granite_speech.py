"""Granite Speech configs (reference
models/granite_speech/configuration_granite_speech.py): conformer CTC audio
encoder + BLIP-2 Q-Former window projector + Granite LLM."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..auto.configuration_auto import get_config_class


class GraniteSpeechEncoderConfig(PretrainedConfig):
    model_type = "granite_speech_encoder"

    def __init__(self, input_dim=160, num_layers=10, hidden_dim=1024,
                 feedforward_mult=4, num_heads=8, dim_head=None, output_dim=42,
                 context_size=200, max_pos_emb=512, dropout=0.1,
                 conv_kernel_size=15, conv_expansion_factor=2, **kwargs):
        self.input_dim = input_dim
        self.num_layers = num_layers
        self.hidden_dim = hidden_dim
        self.feedforward_mult = feedforward_mult
        self.num_heads = num_heads
        self.dim_head = dim_head if dim_head is not None else hidden_dim // num_heads
        self.output_dim = output_dim
        self.context_size = context_size
        self.max_pos_emb = max_pos_emb
        self.dropout = dropout
        self.conv_kernel_size = conv_kernel_size
        self.conv_expansion_factor = conv_expansion_factor
        super().__init__(**kwargs)


class GraniteSpeechConfig(PretrainedConfig):
    model_type = "granite_speech"
    sub_configs = {"text_config": "auto",
                   "encoder_config": GraniteSpeechEncoderConfig,
                   "projector_config": "auto"}

    def __init__(self, text_config=None, encoder_config=None,
                 projector_config=None, audio_token_index=49155,
                 initializer_range=0.02, has_lora_adapter=True,
                 downsample_rate=5, window_size=15, **kwargs):
        if isinstance(text_config, dict):
            text_config = get_config_class(
                text_config.get("model_type", "granite"))(**text_config)
        elif text_config is None:
            text_config = get_config_class("granite")()
        if isinstance(encoder_config, dict):
            encoder_config = GraniteSpeechEncoderConfig(**encoder_config)
        elif encoder_config is None:
            encoder_config = GraniteSpeechEncoderConfig()
        if isinstance(projector_config, dict):
            projector_config = get_config_class(
                projector_config.get("model_type", "blip_2_qformer"))(**projector_config)
        elif projector_config is None:
            projector_config = get_config_class("blip_2_qformer")()
        self.text_config = text_config
        self.encoder_config = encoder_config
        self.projector_config = projector_config
        self.audio_token_index = audio_token_index
        self.audio_token_id = audio_token_index
        self.initializer_range = initializer_range
        self.has_lora_adapter = has_lora_adapter
        self.downsample_rate = downsample_rate
        self.window_size = window_size
        super().__init__(**kwargs)
