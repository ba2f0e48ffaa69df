"""VaultGemma decoder (reference src/transformers/models/vaultgemma/modular_vaultgemma.py).

Gemma2 with the sandwich norms REMOVED: only input_layernorm before
attention and pre_feedforward_layernorm before the MLP (differentially
private training favors the simpler residual structure).
"""

from __future__ import annotations

from ..gemma2.modeling_gemma2 import Gemma2DecoderLayer
from ..llama.modeling_llama import LlamaForCausalLM, LlamaModel, LlamaModelStandalone
from .configuration_vaultgemma import VaultGemmaConfig


class VaultGemmaDecoderLayer(Gemma2DecoderLayer):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        for name in ("post_attention_layernorm", "post_feedforward_layernorm"):
            del self._children[name]
            object.__delattr__(self, name)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args, cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.pre_feedforward_layernorm(params["pre_feedforward_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        return residual + h, cache


class VaultGemmaModel(LlamaModel):
    decoder_layer_cls = VaultGemmaDecoderLayer
    scale_embeddings = True


class VaultGemmaForCausalLM(LlamaForCausalLM):
    config_class = VaultGemmaConfig
    model_cls = VaultGemmaModel


class VaultGemmaModelStandalone(LlamaModelStandalone):
    config_class = VaultGemmaConfig
    model_cls = VaultGemmaModel
