"""TimeSeriesTransformer config (reference
src/transformers/models/time_series_transformer/configuration_time_series_transformer.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class TimeSeriesTransformerConfig(PretrainedConfig):
    model_type = "time_series_transformer"
    attribute_map = {"hidden_size": "d_model",
                     "num_attention_heads": "encoder_attention_heads",
                     "num_hidden_layers": "encoder_layers"}

    def __init__(self, prediction_length=None, context_length=None,
                 distribution_output="student_t", loss="nll", input_size=1,
                 lags_sequence=(1, 2, 3, 4, 5, 6, 7), scaling="mean",
                 num_dynamic_real_features=0, num_static_categorical_features=0,
                 num_static_real_features=0, num_time_features=0,
                 cardinality=None, embedding_dimension=None,
                 encoder_ffn_dim=32, decoder_ffn_dim=32,
                 encoder_attention_heads=2, decoder_attention_heads=2,
                 encoder_layers=2, decoder_layers=2, is_encoder_decoder=True,
                 activation_function="gelu", d_model=64, dropout=0.1,
                 encoder_layerdrop=0.1, decoder_layerdrop=0.1,
                 attention_dropout=0.1, activation_dropout=0.1,
                 num_parallel_samples=100, init_std=0.02, use_cache=True,
                 **kwargs):
        self.prediction_length = prediction_length
        self.context_length = context_length if context_length is not None else prediction_length
        self.distribution_output = distribution_output
        self.loss = loss
        self.input_size = input_size
        self.lags_sequence = list(lags_sequence)
        self.scaling = scaling
        self.num_dynamic_real_features = num_dynamic_real_features
        self.num_static_categorical_features = num_static_categorical_features
        self.num_static_real_features = num_static_real_features
        self.num_time_features = num_time_features
        if cardinality and num_static_categorical_features > 0:
            self.cardinality = list(cardinality)
        else:
            self.cardinality = [0]
        if embedding_dimension and num_static_categorical_features > 0:
            self.embedding_dimension = list(embedding_dimension)
        else:
            self.embedding_dimension = [min(50, (cat + 1) // 2) for cat in self.cardinality]
        self.encoder_ffn_dim = encoder_ffn_dim
        self.decoder_ffn_dim = decoder_ffn_dim
        self.encoder_attention_heads = encoder_attention_heads
        self.decoder_attention_heads = decoder_attention_heads
        self.encoder_layers = encoder_layers
        self.decoder_layers = decoder_layers
        self.activation_function = activation_function
        self.d_model = d_model
        self.dropout = dropout
        self.encoder_layerdrop = encoder_layerdrop
        self.decoder_layerdrop = decoder_layerdrop
        self.attention_dropout = attention_dropout
        self.activation_dropout = activation_dropout
        self.num_parallel_samples = num_parallel_samples
        self.init_std = init_std
        self.use_cache = use_cache
        self.feature_size = self.input_size * len(self.lags_sequence) + self._number_of_features
        super().__init__(is_encoder_decoder=is_encoder_decoder, **kwargs)

    @property
    def _number_of_features(self) -> int:
        return (sum(self.embedding_dimension) + self.num_dynamic_real_features
                + self.num_time_features + self.num_static_real_features
                + self.input_size * 2)
