"""OLMo3 decoder (reference src/transformers/models/olmo3/modular_olmo3.py).

Olmo2 (full-projection q/k norms, post-sublayer norms) plus:
- sliding-window attention on 3 of 4 layers (``layer_types``);
- RoPE scaling applied ONLY to full-attention layers — sliding layers use
  the unscaled default table (reference Olmo3RotaryEmbedding).
"""

from __future__ import annotations

from types import SimpleNamespace

from ...ops.rope import compute_cos_sin, rope_inv_freq
from ..llama.modeling_llama import LlamaForCausalLM, LlamaModelStandalone
from ..olmo2.modeling_olmo2 import Olmo2DecoderLayer, Olmo2Model
from .configuration_olmo3 import Olmo3Config


class Olmo3DecoderLayer(Olmo2DecoderLayer):
    pass


class Olmo3Model(Olmo2Model):
    decoder_layer_cls = Olmo3DecoderLayer

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        # unscaled table for sliding layers (rope_scaling stripped)
        plain = SimpleNamespace(**{**config.to_dict(), "rope_scaling": None})
        self.sliding_inv_freq, _ = rope_inv_freq(plain)

    def compute_rope(self, position_ids):
        full = compute_cos_sin(position_ids, self.inv_freq, self.attention_scaling,
                               dtype=self.dtype)
        sliding = compute_cos_sin(position_ids, self.sliding_inv_freq, 1.0,
                                  dtype=self.dtype)
        return {"full_attention": full, "sliding_attention": sliding}

    def rope_for_layer(self, rope, layer_idx):
        return rope[self.config.layer_types[layer_idx]]


class Olmo3ForCausalLM(LlamaForCausalLM):
    config_class = Olmo3Config
    model_cls = Olmo3Model


class Olmo3ModelStandalone(LlamaModelStandalone):
    config_class = Olmo3Config
    model_cls = Olmo3Model
