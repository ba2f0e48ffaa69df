"""GLM-4.5V — GLM-4V vision tower over a GLM-4.5-MoE text stack, TPU-native
(reference src/transformers/models/glm4v_moe/modeling_glm4v_moe.py).

Text: plain pre-LN llama layers (NOT the glm4 sandwich), q/k/v bias, partial
(0.5) CONCAT-layout rotary mixed per ``mrope_section`` in the Qwen2-VL
convention (reference apply_multimodal_rotary_pos_emb:113 — sections split
on the doubled cos/sin table), DeepSeek-V3 sigmoid group-limited MoE with
shared experts past ``first_k_dense_replace`` (reference Glm4vMoeTextMoE:289).

Vision + rope-index logic are the Glm4v modules (reference reuses them
verbatim)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...ops.rope import compute_cos_sin
from ..deepseek_v3.modeling_deepseek_v3 import DeepseekV3MoE
from ..glm4v.modeling_glm4v import (Glm4vForConditionalGeneration,
                                    Glm4vModel, Glm4vVisionModel)
from ..llama.modeling_llama import (LlamaAttention, LlamaDecoderLayer,
                                    LlamaModel)
from .configuration_glm4v_moe import Glm4vMoeConfig


class Glm4vMoeTextAttention(LlamaAttention):
    """q/k/v bias per config, o_proj bias-free (reference :166)."""

    def build_projections(self, config, qkv_bias, o_bias, kw):
        super().build_projections(config, config.attention_bias, False, kw)


class Glm4vMoeTextDecoderLayer(LlamaDecoderLayer):
    attention_cls = Glm4vMoeTextAttention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        if layer_idx >= config.first_k_dense_replace:
            del self._children["mlp"]
            object.__delattr__(self, "mlp")
            self.mlp = DeepseekV3MoE(config, dtype=dtype, param_dtype=param_dtype)


class Glm4vMoeTextModel(LlamaModel):
    decoder_layer_cls = Glm4vMoeTextDecoderLayer

    def compute_rope(self, position_ids):
        # [B, S] (decode / pure text) or [3, B, S] (mrope); partial rotary —
        # cos/sin cover only rotary_dim, the attention leaves the tail as-is.
        if position_ids.ndim == 2:
            position_ids = jnp.broadcast_to(position_ids[None], (3, *position_ids.shape))
        cos, sin = compute_cos_sin(position_ids, self.inv_freq, self.attention_scaling,
                                   dtype=self.dtype)  # [3, B, S, rotary_dim]
        section = self.config.mrope_section
        sizes = list(section) + list(section)
        cos_parts = jnp.split(cos, np.cumsum(sizes)[:-1], axis=-1)
        sin_parts = jnp.split(sin, np.cumsum(sizes)[:-1], axis=-1)
        cos = jnp.concatenate([p[i % 3] for i, p in enumerate(cos_parts)], axis=-1)
        sin = jnp.concatenate([p[i % 3] for i, p in enumerate(sin_parts)], axis=-1)
        return cos, sin


class Glm4vMoeModel(Glm4vModel):
    def __init__(self, config: Glm4vMoeConfig, *, dtype, param_dtype):
        # bypass Glm4vModel.__init__ module wiring but keep the composite API
        from ...core.module import Module

        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.visual = Glm4vVisionModel(config.vision_config, **kw)
        self.language_model = Glm4vMoeTextModel(config.text_config, **kw)


class Glm4vMoeForConditionalGeneration(Glm4vForConditionalGeneration):
    config_class = Glm4vMoeConfig
    model_cls = Glm4vMoeModel
