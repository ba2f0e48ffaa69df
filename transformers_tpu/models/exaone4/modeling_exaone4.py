"""EXAONE-4 decoder (reference src/transformers/models/exaone4/modular_exaone4.py).

Olmo2-style POST-norm layers, per-head RMS qk-norms applied before rope,
hybrid attention: sliding layers get rope + window, global layers use NoPE
(rope skipped when a sliding window is configured, :198-199).
"""

from __future__ import annotations

from ...core.module import RMSNorm
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from ..olmo2.modeling_olmo2 import Olmo2DecoderLayer
from .configuration_exaone4 import Exaone4Config


class Exaone4Attention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.q_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)
        self.k_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)
        # global NoPE when the model is hybrid (reference :198-199)
        self.apply_rope = (config.sliding_window is None
                           or config.layer_types[layer_idx] == "sliding_attention")


class Exaone4DecoderLayer(Olmo2DecoderLayer):
    attention_cls = Exaone4Attention


class Exaone4Model(LlamaModel):
    decoder_layer_cls = Exaone4DecoderLayer


class Exaone4ForCausalLM(LlamaForCausalLM):
    config_class = Exaone4Config
    model_cls = Exaone4Model


class Exaone4ModelStandalone(LlamaModelStandalone):
    config_class = Exaone4Config
    model_cls = Exaone4Model
