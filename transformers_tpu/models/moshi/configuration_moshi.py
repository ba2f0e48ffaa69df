"""Moshi configs (reference src/transformers/models/moshi/configuration_moshi.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..mimi.configuration_mimi import MimiConfig


class MoshiDepthConfig(PretrainedConfig):
    model_type = "moshi_depth"

    def __init__(self, vocab_size=32000, hidden_size=1024, input_size=4096,
                 num_hidden_layers=6, num_attention_heads=16, num_key_value_heads=16,
                 audio_vocab_size=2048, max_position_embeddings=9, hidden_act="silu",
                 head_dim=None, initializer_range=0.02, use_cache=True,
                 sliding_window=8, attention_dropout=0.0, ffn_dim=5632,
                 rms_norm_eps=1e-8, num_codebooks=8, tie_word_embeddings=False,
                 **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.input_size = input_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.audio_vocab_size = audio_vocab_size
        self.max_position_embeddings = max_position_embeddings
        self.hidden_act = hidden_act
        self.head_dim = head_dim if head_dim is not None else hidden_size // num_attention_heads
        self.initializer_range = initializer_range
        self.use_cache = use_cache
        self.sliding_window = sliding_window
        self.attention_dropout = attention_dropout
        self.ffn_dim = ffn_dim
        self.rms_norm_eps = rms_norm_eps
        self.num_codebooks = num_codebooks
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)


class MoshiConfig(PretrainedConfig):
    model_type = "moshi"
    sub_configs = {"audio_encoder_config": MimiConfig,
                   "depth_decoder_config": MoshiDepthConfig}

    def __init__(self, vocab_size=32000, hidden_size=4096, num_hidden_layers=32,
                 num_attention_heads=32, num_key_value_heads=32,
                 audio_vocab_size=None, max_position_embeddings=3000,
                 rope_theta=10000.0, hidden_act="silu", head_dim=None,
                 initializer_range=0.02, use_cache=True, sliding_window=3000,
                 attention_dropout=0.0, ffn_dim=22528, rms_norm_eps=1e-8,
                 num_codebooks=8, tie_word_embeddings=False,
                 audio_encoder_config=None, depth_decoder_config=None, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.max_position_embeddings = max_position_embeddings
        self.rope_theta = rope_theta
        self.hidden_act = hidden_act
        self.head_dim = head_dim if head_dim is not None else hidden_size // num_attention_heads
        self.initializer_range = initializer_range
        self.use_cache = use_cache
        self.sliding_window = sliding_window
        self.attention_dropout = attention_dropout
        self.ffn_dim = ffn_dim
        self.rms_norm_eps = rms_norm_eps
        self.num_codebooks = num_codebooks
        if isinstance(audio_encoder_config, dict) or audio_encoder_config is None:
            audio_encoder_config = MimiConfig(**{
                k: v for k, v in (audio_encoder_config or {}).items() if k != "model_type"})
        self.audio_encoder_config = audio_encoder_config
        if isinstance(depth_decoder_config, dict) or depth_decoder_config is None:
            depth_decoder_config = MoshiDepthConfig(**{
                k: v for k, v in (depth_decoder_config or {}).items() if k != "model_type"})
        self.depth_decoder_config = depth_decoder_config
        self.audio_vocab_size = (audio_vocab_size if audio_vocab_size is not None
                                 else self.audio_encoder_config.codebook_size)
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)
