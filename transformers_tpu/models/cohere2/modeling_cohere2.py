"""Cohere2 / Command-R7B (reference src/transformers/models/cohere2/modeling_cohere2.py).

Cohere parallel-residual skeleton with a sliding/full layer pattern:
every ``sliding_window_pattern``-th layer is full attention WITHOUT rope
(NoPE), the rest are sliding-window WITH interleaved rope (reference
Cohere2Attention: rope applied only `if self.sliding_window is not None`)."""

from __future__ import annotations

from ..cohere.configuration_cohere import CohereConfig
from ..cohere.modeling_cohere import (
    CohereAttention,
    CohereDecoderLayer,
    CohereForCausalLM,
    CohereModel,
    CohereModelStandalone,
)


class Cohere2Config(CohereConfig):
    model_type = "cohere2"

    def __init__(self, sliding_window=4096, sliding_window_pattern=4,
                 layer_types=None, **kwargs):
        kwargs.pop("use_qk_norm", None)
        super().__init__(**kwargs)
        self.sliding_window = sliding_window
        self.sliding_window_pattern = sliding_window_pattern
        if layer_types is None:
            layer_types = [
                "full_attention" if (i + 1) % sliding_window_pattern == 0
                else "sliding_attention"
                for i in range(self.num_hidden_layers)
            ]
        self.layer_types = layer_types


class Cohere2Attention(CohereAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        # full-attention layers are NoPE (reference Cohere2Attention.forward)
        self.apply_rope = self.sliding_window is not None


class Cohere2DecoderLayer(CohereDecoderLayer):
    attention_cls = Cohere2Attention


class Cohere2Model(CohereModel):
    decoder_layer_cls = Cohere2DecoderLayer


class Cohere2ForCausalLM(CohereForCausalLM):
    config_class = Cohere2Config
    model_cls = Cohere2Model


class Cohere2ModelStandalone(CohereModelStandalone):
    config_class = Cohere2Config
    model_cls = Cohere2Model
