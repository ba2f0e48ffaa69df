"""CSM (Sesame) configs (reference models/csm/configuration_csm.py): a
llama-style backbone predicts codebook-0 of each Mimi audio frame; a small
depth decoder autoregressively fills codebooks 1..N-1."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..auto.configuration_auto import get_config_class


class CsmDepthDecoderConfig(PretrainedConfig):
    model_type = "csm_depth_decoder_model"

    def __init__(self, num_codebooks=32, backbone_hidden_size=2048,
                 vocab_size=2051, hidden_size=1024, intermediate_size=8192,
                 num_hidden_layers=4, num_attention_heads=8,
                 num_key_value_heads=2, hidden_act="silu",
                 max_position_embeddings=33, initializer_range=0.02,
                 rms_norm_eps=1e-5, use_cache=True, rope_theta=500000.0,
                 attention_bias=False, attention_dropout=0.0, mlp_bias=False,
                 head_dim=None, **kwargs):
        self.num_codebooks = num_codebooks
        self.backbone_hidden_size = backbone_hidden_size
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads or num_attention_heads
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = kwargs.pop("rope_parameters", None) or rope_theta
        if isinstance(self.rope_theta, dict):
            self.rope_theta = self.rope_theta.get("rope_theta", rope_theta)
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.mlp_bias = mlp_bias
        self.head_dim = head_dim if head_dim is not None \
            else hidden_size // num_attention_heads
        super().__init__(**kwargs)


class CsmConfig(PretrainedConfig):
    model_type = "csm"
    sub_configs = {"codec_config": "auto",
                   "depth_decoder_config": CsmDepthDecoderConfig}

    def __init__(self, num_codebooks=32, vocab_size=2051,
                 text_vocab_size=128256, hidden_size=2048,
                 intermediate_size=8192, num_hidden_layers=16,
                 num_attention_heads=32, num_key_value_heads=8,
                 hidden_act="silu", max_position_embeddings=2048,
                 initializer_range=0.02, rms_norm_eps=1e-5, use_cache=True,
                 pad_token_id=128002, codebook_pad_token_id=2050,
                 codebook_eos_token_id=0, bos_token_id=128000,
                 eos_token_id=None, audio_token_id=128002,
                 audio_eos_token_id=128003, rope_theta=500000.0,
                 attention_bias=False, attention_dropout=0.0, mlp_bias=False,
                 head_dim=None, tie_codebooks_embeddings=True,
                 depth_decoder_config=None, codec_config=None, **kwargs):
        self.num_codebooks = num_codebooks
        self.vocab_size = vocab_size
        self.codebook_size = vocab_size
        self.text_vocab_size = text_vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads or num_attention_heads
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.codebook_pad_token_id = codebook_pad_token_id
        self.codebook_eos_token_id = codebook_eos_token_id
        self.audio_token_id = audio_token_id
        self.audio_eos_token_id = audio_eos_token_id
        self.rope_theta = kwargs.pop("rope_parameters", None) or rope_theta
        if isinstance(self.rope_theta, dict):
            self.rope_theta = self.rope_theta.get("rope_theta", rope_theta)
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.mlp_bias = mlp_bias
        self.head_dim = head_dim if head_dim is not None \
            else hidden_size // num_attention_heads
        self.tie_codebooks_embeddings = tie_codebooks_embeddings
        if isinstance(depth_decoder_config, dict):
            depth_decoder_config = CsmDepthDecoderConfig(**depth_decoder_config)
        elif depth_decoder_config is None:
            depth_decoder_config = CsmDepthDecoderConfig(
                num_codebooks=num_codebooks, vocab_size=vocab_size,
                backbone_hidden_size=hidden_size)
        if isinstance(codec_config, dict):
            codec_config = get_config_class(
                codec_config.get("model_type", "mimi"))(**codec_config)
        elif codec_config is None:
            codec_config = get_config_class("mimi")()
        self.depth_decoder_config = depth_decoder_config
        self.codec_config = codec_config
        kwargs.pop("tie_word_embeddings", None)
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         tie_word_embeddings=False, **kwargs)
