"""Youtu decoder (reference src/transformers/models/youtu/modular_youtu.py):
DeepSeek-V3 MLA attention (q/kv low-rank, interleaved rope) over plain dense
gated MLPs — no MoE — with tied embeddings and muP-style init ranges."""

from __future__ import annotations

from ..deepseek_v3.modeling_deepseek_v3 import (
    DeepseekV3Attention,
    DeepseekV3ForCausalLM,
)
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_youtu import YoutuConfig


class YoutuDecoderLayer(LlamaDecoderLayer):
    attention_cls = DeepseekV3Attention


class YoutuModel(LlamaModel):
    decoder_layer_cls = YoutuDecoderLayer


class YoutuForCausalLM(DeepseekV3ForCausalLM):
    config_class = YoutuConfig
    model_cls = YoutuModel


class YoutuModelStandalone(LlamaModelStandalone):
    config_class = YoutuConfig
    model_cls = YoutuModel
