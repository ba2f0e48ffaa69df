"""Switch Transformers config (reference
src/transformers/models/switch_transformers/configuration_switch_transformers.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class SwitchTransformersConfig(PretrainedConfig):
    model_type = "switch_transformers"
    attribute_map = {"hidden_size": "d_model", "num_attention_heads": "num_heads",
                     "num_hidden_layers": "num_layers"}

    def __init__(self, vocab_size=32128, d_model=768, d_kv=64, d_ff=2048,
                 expert_capacity=64, num_layers=12, num_sparse_encoder_layers=3,
                 num_decoder_layers=12, num_sparse_decoder_layers=3, num_heads=12,
                 num_experts=8, router_bias=False, router_jitter_noise=0.01,
                 router_dtype="float32", router_ignore_padding_tokens=False,
                 relative_attention_num_buckets=32, relative_attention_max_distance=128,
                 dropout_rate=0.1, layer_norm_epsilon=1e-6, router_z_loss_coef=0.001,
                 router_aux_loss_coef=0.001, initializer_factor=1.0,
                 dense_act_fn="relu", is_encoder_decoder=True, add_router_probs=False,
                 use_cache=True, pad_token_id=0, eos_token_id=1, **kwargs):
        self.vocab_size = vocab_size
        self.d_model = d_model
        self.d_kv = d_kv
        self.d_ff = d_ff
        self.num_layers = num_layers
        self.num_sparse_encoder_layers = num_sparse_encoder_layers
        self.num_decoder_layers = num_decoder_layers
        self.num_sparse_decoder_layers = num_sparse_decoder_layers
        self.num_heads = num_heads
        self.num_experts = num_experts
        self.expert_capacity = expert_capacity
        self.router_bias = router_bias
        self.router_jitter_noise = router_jitter_noise
        self.router_dtype = router_dtype
        self.router_ignore_padding_tokens = router_ignore_padding_tokens
        self.relative_attention_num_buckets = relative_attention_num_buckets
        self.relative_attention_max_distance = relative_attention_max_distance
        self.dropout_rate = dropout_rate
        self.layer_norm_epsilon = layer_norm_epsilon
        self.router_z_loss_coef = router_z_loss_coef
        self.router_aux_loss_coef = router_aux_loss_coef
        self.initializer_factor = initializer_factor
        self.initializer_range = initializer_factor * 0.05
        self.dense_act_fn = dense_act_fn
        self.is_gated_act = False
        self.add_router_probs = add_router_probs
        self.use_cache = use_cache
        # every sparse_step-th layer is a MoE layer (reference config)
        self.encoder_sparse_step = (num_layers // num_sparse_encoder_layers
                                    if num_sparse_encoder_layers > 0 else num_layers)
        self.decoder_sparse_step = (num_decoder_layers // num_sparse_decoder_layers
                                    if num_sparse_decoder_layers > 0 else num_decoder_layers)
        kwargs.setdefault("tie_word_embeddings", True)
        kwargs.setdefault("decoder_start_token_id", pad_token_id)
        super().__init__(pad_token_id=pad_token_id, eos_token_id=eos_token_id,
                         is_encoder_decoder=is_encoder_decoder, **kwargs)
