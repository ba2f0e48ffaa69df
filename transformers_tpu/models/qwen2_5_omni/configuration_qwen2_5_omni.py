"""Qwen2.5-Omni configs (reference
models/qwen2_5_omni/configuration_qwen2_5_omni.py): the Thinker combines a
windowed Whisper-style audio encoder, the Qwen2.5-VL vision encoder, and a
Qwen2 text stack with time-aligned 3D M-RoPE. The Talker/Token2Wav speech
path is configured but not yet modeled here (see modeling docstring)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLVisionConfig
from ..qwen2_vl.configuration_qwen2_vl import Qwen2VLTextConfig


class Qwen2_5OmniVisionEncoderConfig(Qwen2_5_VLVisionConfig):
    model_type = "qwen2_5_omni_vision_encoder"

    def __init__(self, embed_dim=1280, **kwargs):
        self.embed_dim = embed_dim
        super().__init__(**kwargs)


class Qwen2_5OmniAudioEncoderConfig(PretrainedConfig):
    model_type = "qwen2_5_omni_audio_encoder"

    def __init__(self, num_mel_bins=128, encoder_layers=32,
                 encoder_attention_heads=20, encoder_ffn_dim=5120,
                 d_model=1280, dropout=0.0, attention_dropout=0.0,
                 activation_function="gelu", activation_dropout=0.0,
                 scale_embedding=False, initializer_range=0.02,
                 max_source_positions=1500, n_window=100, output_dim=3584,
                 **kwargs):
        self.num_mel_bins = num_mel_bins
        self.encoder_layers = encoder_layers
        self.num_hidden_layers = encoder_layers
        self.encoder_attention_heads = encoder_attention_heads
        self.encoder_ffn_dim = encoder_ffn_dim
        self.d_model = d_model
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        self.activation_function = activation_function
        self.activation_dropout = activation_dropout
        self.scale_embedding = scale_embedding
        self.initializer_range = initializer_range
        self.max_source_positions = max_source_positions
        self.n_window = n_window
        self.output_dim = output_dim
        kwargs.pop("num_hidden_layers", None)
        super().__init__(**kwargs)


class Qwen2_5OmniTextConfig(Qwen2VLTextConfig):
    model_type = "qwen2_5_omni_text"


class Qwen2_5OmniThinkerConfig(PretrainedConfig):
    model_type = "qwen2_5_omni_thinker"
    sub_configs = {"audio_config": Qwen2_5OmniAudioEncoderConfig,
                   "vision_config": Qwen2_5OmniVisionEncoderConfig,
                   "text_config": Qwen2_5OmniTextConfig}

    def __init__(self, audio_config=None, vision_config=None, text_config=None,
                 audio_token_index=151646, image_token_index=151655,
                 video_token_index=151656, position_id_per_seconds=25,
                 seconds_per_chunk=2, audio_start_token_id=151647,
                 audio_end_token_id=151648, user_token_id=872,
                 vision_start_token_id=151652, vision_end_token_id=151653,
                 initializer_range=0.02, **kwargs):
        self.vision_start_token_id = vision_start_token_id
        self.vision_end_token_id = vision_end_token_id
        self.audio_config = (Qwen2_5OmniAudioEncoderConfig(**(audio_config or {}))
                             if not isinstance(audio_config, Qwen2_5OmniAudioEncoderConfig)
                             else audio_config)
        self.vision_config = (Qwen2_5OmniVisionEncoderConfig(**(vision_config or {}))
                              if not isinstance(vision_config, Qwen2_5OmniVisionEncoderConfig)
                              else vision_config)
        self.text_config = (Qwen2_5OmniTextConfig(**(text_config or {}))
                            if not isinstance(text_config, Qwen2_5OmniTextConfig)
                            else text_config)
        self.audio_token_index = audio_token_index
        self.audio_token_id = audio_token_index
        self.image_token_index = image_token_index
        self.image_token_id = image_token_index
        self.video_token_index = video_token_index
        self.video_token_id = video_token_index
        self.position_id_per_seconds = position_id_per_seconds
        self.seconds_per_chunk = seconds_per_chunk
        self.audio_start_token_id = audio_start_token_id
        self.audio_end_token_id = audio_end_token_id
        self.user_token_id = user_token_id
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class Qwen2_5OmniConfig(PretrainedConfig):
    model_type = "qwen2_5_omni"
    sub_configs = {"thinker_config": Qwen2_5OmniThinkerConfig}

    def __init__(self, thinker_config=None, talker_config=None,
                 token2wav_config=None, enable_audio_output=True, **kwargs):
        self.thinker_config = (Qwen2_5OmniThinkerConfig(**(thinker_config or {}))
                               if not isinstance(thinker_config, Qwen2_5OmniThinkerConfig)
                               else thinker_config)
        # talker / token2wav configs are carried verbatim for checkpoint
        # round-trips; the speech-generation path is not modeled yet
        self.talker_config = talker_config
        self.token2wav_config = token2wav_config
        self.enable_audio_output = enable_audio_output
        super().__init__(**kwargs)
