"""RecurrentGemma config (reference
src/transformers/models/recurrent_gemma/configuration_recurrent_gemma.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class RecurrentGemmaConfig(PretrainedConfig):
    model_type = "recurrent_gemma"
    attribute_map = {"sliding_window": "attention_window_size"}

    def __init__(self, num_hidden_layers=26, vocab_size=256000, hidden_size=2560,
                 intermediate_size=7680, num_attention_heads=10,
                 lru_width=None, attention_window_size=2048, conv1d_width=4,
                 logits_soft_cap=30.0, rms_norm_eps=1e-6, use_cache=True,
                 rope_theta=10000.0, block_types=("recurrent", "recurrent", "attention"),
                 hidden_activation="gelu_pytorch_tanh", partial_rotary_factor=0.5,
                 num_key_value_heads=None, attention_dropout=0.0,
                 attention_bias=False, initializer_range=0.02,
                 w_init_variance_scale=0.01, **kwargs):
        self.num_hidden_layers = num_hidden_layers
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_attention_heads = num_attention_heads
        self.lru_width = lru_width if lru_width is not None else hidden_size
        self.attention_window_size = attention_window_size
        self.conv1d_width = conv1d_width
        self.logits_soft_cap = logits_soft_cap
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.block_types = list(block_types)
        self.hidden_activation = hidden_activation
        self.hidden_act = hidden_activation
        self.head_dim = hidden_size // num_attention_heads
        self.num_key_value_heads = (num_key_value_heads
                                    if num_key_value_heads is not None
                                    else num_attention_heads)
        self.attention_dropout = attention_dropout
        self.attention_bias = attention_bias
        self.initializer_range = initializer_range
        self.w_init_variance_scale = w_init_variance_scale
        # rotary on the first half of each head (Griffin paper + torch 4.57)
        self.partial_rotary_factor = partial_rotary_factor
        # sliding window applies only on attention layers
        self.layer_types = ["sliding_attention" if t == "attention" else t
                            for t in self.layers_block_type]
        kwargs.setdefault("tie_word_embeddings", True)
        kwargs.setdefault("bos_token_id", 2)
        kwargs.setdefault("eos_token_id", 1)
        kwargs.setdefault("pad_token_id", 0)
        super().__init__(**kwargs)

    @property
    def layers_block_type(self):
        return (self.block_types * 100)[: self.num_hidden_layers]
