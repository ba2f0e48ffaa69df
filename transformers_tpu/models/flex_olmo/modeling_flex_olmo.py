"""FlexOlmo decoder (reference src/transformers/models/flex_olmo/modular_flex_olmo.py).

Olmo2 structure (full-projection q/k norms, post-sublayer norms) with the
OLMoE sparse-MoE MLP block.
"""

from __future__ import annotations

from ..llama.modeling_llama import LlamaForCausalLM, LlamaModelStandalone
from ..olmo2.modeling_olmo2 import Olmo2DecoderLayer, Olmo2Model
from ..olmoe.modeling_olmoe import OlmoeSparseMoeBlock
from .configuration_flex_olmo import FlexOlmoConfig


class FlexOlmoDecoderLayer(Olmo2DecoderLayer):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        del self._children["mlp"]
        object.__delattr__(self, "mlp")
        self.mlp = OlmoeSparseMoeBlock(config, dtype=dtype, param_dtype=param_dtype)


class FlexOlmoModel(Olmo2Model):
    decoder_layer_cls = FlexOlmoDecoderLayer


class FlexOlmoForCausalLM(LlamaForCausalLM):
    config_class = FlexOlmoConfig
    model_cls = FlexOlmoModel


class FlexOlmoModelStandalone(LlamaModelStandalone):
    config_class = FlexOlmoConfig
    model_cls = FlexOlmoModel
