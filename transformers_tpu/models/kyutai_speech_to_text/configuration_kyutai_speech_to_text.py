"""Kyutai STT config (reference
models/kyutai_speech_to_text/configuration_kyutai_speech_to_text.py):
Moshi-style sliding-window decoder consuming interleaved text+audio-codebook
frames from the Mimi codec."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..auto.configuration_auto import get_config_class


class KyutaiSpeechToTextConfig(PretrainedConfig):
    model_type = "kyutai_speech_to_text"
    sub_configs = {"codec_config": "auto"}

    def __init__(self, codebook_vocab_size=2049, vocab_size=4001,
                 hidden_size=2048, num_hidden_layers=48,
                 num_attention_heads=32, num_key_value_heads=None,
                 max_position_embeddings=750, rope_theta=100000.0,
                 hidden_act="silu", head_dim=None, initializer_range=0.02,
                 use_cache=True, sliding_window=375, attention_dropout=0.0,
                 ffn_dim=11264, rms_norm_eps=1e-8, num_codebooks=32,
                 audio_bos_token_id=2048, audio_pad_token_id=69569,
                 tie_word_embeddings=False, pad_token_id=3,
                 bos_token_id=48000, eos_token_id=None, codec_config=None,
                 **kwargs):
        self.codebook_vocab_size = codebook_vocab_size
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads or num_attention_heads
        self.max_position_embeddings = max_position_embeddings
        rp = kwargs.pop("rope_parameters", None)
        self.rope_theta = (rp.get("rope_theta", rope_theta)
                           if isinstance(rp, dict) else rope_theta)
        self.hidden_act = hidden_act
        self.head_dim = head_dim if head_dim is not None \
            else hidden_size // num_attention_heads
        self.initializer_range = initializer_range
        self.use_cache = use_cache
        self.sliding_window = sliding_window
        self.attention_dropout = attention_dropout
        self.ffn_dim = ffn_dim
        self.rms_norm_eps = rms_norm_eps
        self.num_codebooks = num_codebooks
        self.audio_bos_token_id = audio_bos_token_id
        self.audio_pad_token_id = audio_pad_token_id
        self.attention_bias = False
        self.mlp_bias = False
        if isinstance(codec_config, dict):
            codec_config = get_config_class(
                codec_config.get("model_type", "mimi"))(**codec_config)
        elif codec_config is None:
            codec_config = get_config_class("mimi")()
        self.codec_config = codec_config
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)
