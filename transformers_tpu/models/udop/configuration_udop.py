"""UDOP config (reference models/udop/configuration_udop.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class UdopConfig(PretrainedConfig):
    model_type = "udop"
    attribute_map = {"hidden_size": "d_model",
                     "num_attention_heads": "num_heads",
                     "num_hidden_layers": "num_layers"}

    def __init__(self, vocab_size=33201, d_model=1024, d_kv=64, d_ff=4096,
                 num_layers=24, num_decoder_layers=None, num_heads=16,
                 relative_attention_num_buckets=32,
                 relative_attention_max_distance=128,
                 relative_bias_args=({"type": "1d"}, {"type": "horizontal"},
                                     {"type": "vertical"}),
                 dropout_rate=0.1, layer_norm_epsilon=1e-6,
                 initializer_factor=1.0, feed_forward_proj="relu",
                 is_encoder_decoder=True, use_cache=True, pad_token_id=0,
                 eos_token_id=1, max_2d_position_embeddings=1024,
                 image_size=224, patch_size=16, num_channels=3, **kwargs):
        self.vocab_size = vocab_size
        self.d_model = d_model
        self.d_kv = d_kv
        self.d_ff = d_ff
        self.num_layers = num_layers
        self.num_decoder_layers = (num_decoder_layers
                                   if num_decoder_layers is not None else num_layers)
        self.num_heads = num_heads
        self.relative_attention_num_buckets = relative_attention_num_buckets
        self.relative_attention_max_distance = relative_attention_max_distance
        self.relative_bias_args = [dict(b) for b in relative_bias_args]
        self.dropout_rate = dropout_rate
        self.layer_norm_epsilon = layer_norm_epsilon
        self.initializer_factor = initializer_factor
        self.feed_forward_proj = feed_forward_proj
        self.use_cache = use_cache
        self.max_2d_position_embeddings = max_2d_position_embeddings
        self.image_size = image_size
        self.patch_size = patch_size
        self.num_channels = num_channels
        act_info = feed_forward_proj.split("-")
        self.dense_act_fn = act_info[-1]
        self.is_gated_act = act_info[0] == "gated"
        if self.dense_act_fn == "gelu":
            self.dense_act_fn = "gelu_new"
        super().__init__(pad_token_id=pad_token_id, eos_token_id=eos_token_id,
                         is_encoder_decoder=is_encoder_decoder, **kwargs)
