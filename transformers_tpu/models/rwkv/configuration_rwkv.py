"""RWKV config (reference src/transformers/models/rwkv/configuration_rwkv.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class RwkvConfig(PretrainedConfig):
    model_type = "rwkv"
    attribute_map = {"max_position_embeddings": "context_length"}

    def __init__(self, vocab_size=50277, context_length=1024, hidden_size=4096,
                 num_hidden_layers=32, attention_hidden_size=None,
                 intermediate_size=None, layer_norm_epsilon=1e-5,
                 bos_token_id=0, eos_token_id=0, rescale_every=6,
                 use_cache=True, **kwargs):
        self.vocab_size = vocab_size
        self.context_length = context_length
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.attention_hidden_size = (attention_hidden_size
                                      if attention_hidden_size is not None
                                      else hidden_size)
        self.intermediate_size = (intermediate_size
                                  if intermediate_size is not None
                                  else 4 * hidden_size)
        self.layer_norm_epsilon = layer_norm_epsilon
        self.rescale_every = rescale_every
        self.use_cache = use_cache
        kwargs.setdefault("tie_word_embeddings", False)
        super().__init__(bos_token_id=bos_token_id, eos_token_id=eos_token_id,
                         **kwargs)
