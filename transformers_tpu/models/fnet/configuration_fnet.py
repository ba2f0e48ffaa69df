"""FNet config (reference src/transformers/models/fnet/configuration_fnet.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class FNetConfig(PretrainedConfig):
    model_type = "fnet"

    def __init__(self, vocab_size=32000, hidden_size=768, num_hidden_layers=12,
                 intermediate_size=3072, hidden_act="gelu_new", hidden_dropout_prob=0.1,
                 max_position_embeddings=512, type_vocab_size=4, initializer_range=0.02,
                 layer_norm_eps=1e-12, use_tpu_fourier_optimizations=False,
                 tpu_short_seq_length=512, pad_token_id=3, bos_token_id=1,
                 eos_token_id=2, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.use_tpu_fourier_optimizations = use_tpu_fourier_optimizations
        self.tpu_short_seq_length = tpu_short_seq_length
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)
