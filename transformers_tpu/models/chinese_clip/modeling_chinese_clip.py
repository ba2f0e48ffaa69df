"""Chinese-CLIP, TPU-native (reference src/transformers/models/chinese_clip/modeling_chinese_clip.py).

Contrastive dual encoder: BERT text tower (no pooler — the [CLS] hidden state
feeds text_projection directly, reference modeling_chinese_clip.py:866) +
CLIP-style ViT vision tower (pre_layrnorm / post_layernorm, class-token
pooling). Shares our CLIP vision transformer and BERT encoder blocks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from ...core.module import Linear
from ...modeling_utils import PreTrainedModel
from ...utils.generic import ModelOutput
from ..bert.modeling_bert import BertModel
from ..clip.modeling_clip import CLIPVisionTransformer
from .configuration_chinese_clip import ChineseCLIPConfig


@dataclass
class ChineseCLIPOutput(ModelOutput):
    loss: Any = None
    logits_per_image: Any = None
    logits_per_text: Any = None
    text_embeds: Any = None
    image_embeds: Any = None
    text_model_output: Any = None
    vision_model_output: Any = None


class ChineseCLIPPreTrainedModel(PreTrainedModel):
    config_class = ChineseCLIPConfig
    base_model_prefix = ""
    _keys_to_ignore_on_load_unexpected = (r"position_ids$",)


class ChineseCLIPModel(ChineseCLIPPreTrainedModel):
    """Reference modeling_chinese_clip.py:814."""

    main_input_name = "input_ids"

    def __init__(self, config: ChineseCLIPConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_model = BertModel(config.text_config, add_pooling_layer=False, **kw)
        self.vision_model = CLIPVisionTransformer(config.vision_config, **kw)
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
                          token_type_ids=None, position_ids=None):
        out = self.text_model(params["text_model"], input_ids, attention_mask,
                              token_type_ids, position_ids)
        pooled = out.last_hidden_state[:, 0]
        return self.text_projection(params["text_projection"], pooled)

    def get_image_features(self, params, pixel_values):
        out = self.vision_model(params["vision_model"], pixel_values)
        return self.visual_projection(params["visual_projection"], out.pooler_output)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, token_type_ids=None, position_ids=None,
                 return_loss=False, **kwargs) -> ChineseCLIPOutput:
        vision_out = self.vision_model(params["vision_model"], pixel_values)
        text_out = self.text_model(params["text_model"], input_ids,
                                   attention_mask, token_type_ids, position_ids)
        image_embeds = self.visual_projection(params["visual_projection"],
                                              vision_out.pooler_output)
        text_embeds = self.text_projection(params["text_projection"],
                                           text_out.last_hidden_state[:, 0])
        image_embeds = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
        text_embeds = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
        logit_scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        logits_per_text = jnp.dot(text_embeds.astype(jnp.float32),
                                  image_embeds.astype(jnp.float32).T) * logit_scale
        logits_per_image = logits_per_text.T
        loss = None
        if return_loss:
            from ...loss import cross_entropy

            labels = jnp.arange(logits_per_text.shape[0])
            loss = (cross_entropy(logits_per_text, labels)
                    + cross_entropy(logits_per_image, labels)) / 2.0
        return ChineseCLIPOutput(
            loss=loss, logits_per_image=logits_per_image,
            logits_per_text=logits_per_text, text_embeds=text_embeds,
            image_embeds=image_embeds, text_model_output=text_out,
            vision_model_output=vision_out)
