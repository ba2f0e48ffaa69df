"""GLM decoder (reference src/transformers/models/glm/modeling_glm.py).

Llama skeleton with three deltas:
- fused ``gate_up_proj`` MLP chunked into (gate, up) (reference :48-63) —
  identical to Phi3MLP, reused;
- INTERLEAVED partial rotary (reference :162-207: cos/sin halved then
  repeat_interleaved, rotate over pairs, applied to the leading
  ``head_dim * partial_rotary_factor`` dims only);
- ``o_proj`` bias-free while q/k/v carry biases (reference :222-231).
"""

from __future__ import annotations

from ...ops.rope import apply_rotary_pos_emb_interleaved, compute_cos_sin_interleaved
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from ..phi3.modeling_phi3 import Phi3MLP
from .configuration_glm import GlmConfig


class GlmMLP(Phi3MLP):
    """gate_up chunk-2 MLP (reference modeling_glm.py:48)."""


class GlmAttention(LlamaAttention):
    """q/k/v biased per ``attention_bias``, o_proj always bias-free
    (reference modeling_glm.py:222-231)."""

    rope_fn = staticmethod(apply_rotary_pos_emb_interleaved)

    def build_projections(self, config, qkv_bias, o_bias, kw):
        super().build_projections(config, config.attention_bias, False, kw)


class GlmDecoderLayer(LlamaDecoderLayer):
    attention_cls = GlmAttention
    mlp_cls = GlmMLP


class GlmModel(LlamaModel):
    decoder_layer_cls = GlmDecoderLayer

    def compute_rope(self, position_ids):
        # Interleaved table over the partial-rotary width (reference
        # modeling_glm.py:191-192 repeat_interleave).
        return compute_cos_sin_interleaved(position_ids, self.inv_freq,
                                           self.attention_scaling, dtype=self.dtype)


class GlmForCausalLM(LlamaForCausalLM):
    config_class = GlmConfig
    model_cls = GlmModel


class GlmModelStandalone(LlamaModelStandalone):
    config_class = GlmConfig
    model_cls = GlmModel
