"""Seed-OSS decoder (reference src/transformers/models/seed_oss/modular_seed_oss.py):
Llama skeleton with biased qkv and a separately-switched o_proj bias."""

from __future__ import annotations

from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_seed_oss import SeedOssConfig


class SeedOssAttention(LlamaAttention):
    def build_projections(self, config, qkv_bias, o_bias, kw):
        super().build_projections(config, config.attention_bias,
                                  config.attention_out_bias, kw)


class SeedOssDecoderLayer(LlamaDecoderLayer):
    attention_cls = SeedOssAttention


class SeedOssModel(LlamaModel):
    decoder_layer_cls = SeedOssDecoderLayer


class SeedOssForCausalLM(LlamaForCausalLM):
    config_class = SeedOssConfig
    model_cls = SeedOssModel


class SeedOssModelStandalone(LlamaModelStandalone):
    config_class = SeedOssConfig
    model_cls = SeedOssModel
