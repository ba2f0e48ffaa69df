"""MetaCLIP 2, TPU-native (reference
src/transformers/models/metaclip_2/modeling_metaclip_2.py).

Same dual-tower geometry as CLIP; the only behavioral difference is text
pooling, which is ALWAYS the first-EOS position
(modeling_metaclip_2.py:497-499) — no legacy argmax(input_ids) path.
Checkpoint key layout matches CLIP, so the CLIP modules load directly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..clip.modeling_clip import (
    CLIPModel,
    CLIPPreTrainedModel,
    CLIPTextTransformer,
    CLIPVisionModel,
    CLIPVisionTransformer,
)
from .configuration_metaclip_2 import (
    MetaClip2Config,
    MetaClip2TextConfig,
    MetaClip2VisionConfig,
)


class MetaClip2TextTransformer(CLIPTextTransformer):
    def _pool_index(self, input_ids):
        # always the first eos (reference modeling_metaclip_2.py:497-499)
        is_eos = (input_ids == self.eos_token_id).astype(jnp.int32)
        return jnp.argmax(is_eos, axis=-1)


class MetaClip2Model(CLIPModel):
    config_class = MetaClip2Config

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        # swap in the first-eos-pooling text tower
        self.text_model = MetaClip2TextTransformer(
            config.text_config, dtype=self.dtype, param_dtype=self.param_dtype)


class MetaClip2VisionModel(CLIPVisionModel):
    config_class = MetaClip2VisionConfig


class MetaClip2TextModel(CLIPPreTrainedModel):
    config_class = MetaClip2TextConfig
    base_model_prefix = "text_model"
    main_input_name = "input_ids"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.text_model = MetaClip2TextTransformer(
            config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, input_ids, attention_mask=None, **kwargs):
        return self.text_model(params["text_model"], input_ids, attention_mask)


__all__ = ["MetaClip2Model", "MetaClip2TextModel", "MetaClip2VisionModel",
           "MetaClip2Config", "MetaClip2TextConfig", "MetaClip2VisionConfig",
           "MetaClip2TextTransformer", "CLIPVisionTransformer"]
