"""Bark configs (reference models/bark/configuration_bark.py and
generation_configuration_bark.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..encodec.configuration_encodec import EncodecConfig


class BarkSubModelConfig(PretrainedConfig):
    def __init__(self, block_size=1024, input_vocab_size=10_048,
                 output_vocab_size=10_048, num_layers=12, num_heads=12,
                 hidden_size=768, dropout=0.0, bias=True,
                 initializer_range=0.02, use_cache=True, **kwargs):
        self.block_size = block_size
        self.input_vocab_size = input_vocab_size
        self.output_vocab_size = output_vocab_size
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.hidden_size = hidden_size
        self.dropout = dropout
        self.bias = bias
        self.initializer_range = initializer_range
        self.use_cache = use_cache
        super().__init__(**kwargs)


class BarkSemanticConfig(BarkSubModelConfig):
    model_type = "semantic"
    base_config_key = "semantic_config"


class BarkCoarseConfig(BarkSubModelConfig):
    model_type = "coarse_acoustics"
    base_config_key = "coarse_acoustics_config"


class BarkFineConfig(BarkSubModelConfig):
    model_type = "fine_acoustics"
    base_config_key = "fine_acoustics_config"

    def __init__(self, tie_word_embeddings=True, n_codes_total=8,
                 n_codes_given=1, **kwargs):
        self.n_codes_total = n_codes_total
        self.n_codes_given = n_codes_given
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)


class BarkConfig(PretrainedConfig):
    model_type = "bark"
    sub_configs = {"semantic_config": BarkSemanticConfig,
                   "coarse_acoustics_config": BarkCoarseConfig,
                   "fine_acoustics_config": BarkFineConfig,
                   "codec_config": EncodecConfig}

    def __init__(self, semantic_config=None, coarse_acoustics_config=None,
                 fine_acoustics_config=None, codec_config=None,
                 initializer_range=0.02, **kwargs):
        def _sub(cls, value):
            if isinstance(value, cls):
                return value
            value = {k: v for k, v in (value or {}).items() if k != "model_type"}
            return cls(**value)

        self.semantic_config = _sub(BarkSemanticConfig, semantic_config)
        self.coarse_acoustics_config = _sub(BarkCoarseConfig, coarse_acoustics_config)
        self.fine_acoustics_config = _sub(BarkFineConfig, fine_acoustics_config)
        self.codec_config = _sub(EncodecConfig, codec_config)
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class BarkSemanticGenerationConfig:
    """Defaults mirror reference BarkSemanticGenerationConfig."""

    def __init__(self, eos_token_id=10_000, max_new_tokens=768, temperature=1.0,
                 do_sample=False, text_encoding_offset=10_048,
                 text_pad_token=129_595, semantic_infer_token=129_599,
                 semantic_vocab_size=10_000, max_input_semantic_length=256,
                 semantic_rate_hz=49.9, min_eos_p=None, **kwargs):
        self.eos_token_id = eos_token_id
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        self.do_sample = do_sample
        self.text_encoding_offset = text_encoding_offset
        self.text_pad_token = text_pad_token
        self.semantic_infer_token = semantic_infer_token
        self.semantic_vocab_size = semantic_vocab_size
        self.max_input_semantic_length = max_input_semantic_length
        self.semantic_rate_hz = semantic_rate_hz
        self.min_eos_p = min_eos_p


class BarkCoarseGenerationConfig:
    def __init__(self, temperature=1.0, do_sample=False,
                 coarse_semantic_pad_token=12_048, coarse_rate_hz=75,
                 n_coarse_codebooks=2, coarse_infer_token=12_050,
                 max_coarse_input_length=256, max_coarse_history=630,
                 sliding_window_len=60, **kwargs):
        self.temperature = temperature
        self.do_sample = do_sample
        self.coarse_semantic_pad_token = coarse_semantic_pad_token
        self.coarse_rate_hz = coarse_rate_hz
        self.n_coarse_codebooks = n_coarse_codebooks
        self.coarse_infer_token = coarse_infer_token
        self.max_coarse_input_length = max_coarse_input_length
        self.max_coarse_history = max_coarse_history
        self.sliding_window_len = sliding_window_len


class BarkFineGenerationConfig:
    def __init__(self, temperature=1.0, max_fine_history_length=512,
                 max_fine_input_length=1024, n_fine_codebooks=8, **kwargs):
        self.temperature = temperature
        self.max_fine_history_length = max_fine_history_length
        self.max_fine_input_length = max_fine_input_length
        self.n_fine_codebooks = n_fine_codebooks
