"""VisionTextDualEncoder, TPU-native (reference
src/transformers/models/vision_text_dual_encoder/modeling_vision_text_dual_encoder.py).

CLIP-style contrastive pairing of ANY registered vision backbone with ANY
text encoder: pooled outputs -> bias-free projections -> normalized
embeddings -> scaled logits. Used to warm-start dual encoders from
unimodal checkpoints."""

from __future__ import annotations

import importlib
from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from ...core.module import Linear, Module
from ...modeling_utils import PreTrainedModel
from ...utils.generic import ModelOutput
from .configuration_vision_text_dual_encoder import VisionTextDualEncoderConfig


@dataclass
class VisionTextDualEncoderOutput(ModelOutput):
    loss: Any = None
    logits_per_image: Any = None
    logits_per_text: Any = None
    text_embeds: Any = None
    image_embeds: Any = None


def _automodel(config, **kw):
    if config.model_type == "clip_vision_model":
        from ..clip.modeling_clip import CLIPVisionModel

        return CLIPVisionModel(config, **kw)
    if config.model_type == "siglip_vision_model":
        from ..siglip.modeling_siglip import SiglipVisionModel

        return SiglipVisionModel(config, **kw)
    from ..auto.modeling_auto import MODEL_MAPPING_NAMES

    module_name, class_name = MODEL_MAPPING_NAMES[config.model_type]
    module = importlib.import_module(f"transformers_tpu.models.{module_name}")
    model = getattr(module, class_name)(config, **kw)
    # unwrap Standalone wrappers (checkpoint keys are the bare base model's)
    children = model.children
    if class_name.endswith("Standalone") and len(children) == 1:
        model = next(iter(children.values()))
    return model


class VisionTextDualEncoderModel(PreTrainedModel):
    config_class = VisionTextDualEncoderConfig
    base_model_prefix = ""
    main_input_name = "input_ids"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vision_model = _automodel(config.vision_config, **kw)
        self.text_model = _automodel(config.text_config, **kw)
        self.visual_projection = Linear(config.vision_config.hidden_size,
                                        config.projection_dim, False, **kw)
        self.text_projection = Linear(config.text_config.hidden_size,
                                      config.projection_dim, False, **kw)
        self.logit_scale_init_value = config.logit_scale_init_value

    def init(self, rng):
        params = super().init(rng)
        params["logit_scale"] = jnp.asarray(self.logit_scale_init_value,
                                            self.param_dtype)
        return params

    def get_text_features(self, params, input_ids, attention_mask=None,
                          token_type_ids=None):
        out = self.text_model(params["text_model"], input_ids, attention_mask,
                              token_type_ids)
        return self.text_projection(params["text_projection"], out.pooler_output)

    def get_image_features(self, params, pixel_values):
        out = self.vision_model(params["vision_model"], pixel_values)
        return self.visual_projection(params["visual_projection"], out.pooler_output)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, token_type_ids=None, return_loss=False,
                 **kwargs) -> VisionTextDualEncoderOutput:
        image_embeds = self.get_image_features(params, pixel_values)
        text_embeds = self.get_text_features(params, input_ids, attention_mask,
                                             token_type_ids)
        image_embeds = image_embeds / jnp.linalg.norm(image_embeds, axis=-1,
                                                      keepdims=True)
        text_embeds = text_embeds / jnp.linalg.norm(text_embeds, axis=-1,
                                                    keepdims=True)
        logit_scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        logits_per_text = jnp.dot(text_embeds.astype(jnp.float32),
                                  image_embeds.astype(jnp.float32).T) * logit_scale
        loss = None
        if return_loss:
            from ...loss import cross_entropy

            labels = jnp.arange(logits_per_text.shape[0])
            loss = (cross_entropy(logits_per_text, labels)
                    + cross_entropy(logits_per_text.T, labels)) / 2.0
        return VisionTextDualEncoderOutput(
            loss=loss, logits_per_image=logits_per_text.T,
            logits_per_text=logits_per_text, text_embeds=text_embeds,
            image_embeds=image_embeds)
