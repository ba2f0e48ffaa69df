"""ALIGN, TPU-native (reference src/transformers/models/align/modeling_align.py).

Noisy-pair contrastive dual encoder: EfficientNet-B7 trunk (blocks only — no
top conv, global-mean pooled) as the image tower and BERT as the text tower.
Only the TEXT side is projected (into the image feature space); similarity is
scaled by a learned ``temperature`` divisor rather than an exp(logit_scale)
multiplier (reference modeling_align.py:991/1146).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from ...core.module import Linear, Module
from ...modeling_utils import PreTrainedModel
from ...utils.generic import ModelOutput
from ..bert.modeling_bert import BertModel
from ..efficientnet.modeling_efficientnet import (EfficientNetBlock,
                                                  EfficientNetEmbeddings,
                                                  round_filters)
from .configuration_align import AlignConfig


@dataclass
class AlignOutput(ModelOutput):
    loss: Any = None
    logits_per_image: Any = None
    logits_per_text: Any = None
    text_embeds: Any = None
    image_embeds: Any = None
    text_model_output: Any = None
    vision_model_output: Any = None


class _AlignVisionEncoder(Module):
    """EfficientNet blocks WITHOUT the top 1x1 conv (reference
    AlignVisionEncoder, modeling_align.py:441)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)

        def round_repeats(r):
            return int(math.ceil(config.depth_coefficient * r))

        blocks = []
        curr = 0
        for i in range(len(config.in_channels)):
            in_dim = round_filters(config, config.in_channels[i])
            out_dim = round_filters(config, config.out_channels[i])
            for j in range(round_repeats(config.num_block_repeats[i])):
                id_skip = j == 0
                stride = config.strides[i] if j == 0 else 1
                bin_dim = in_dim if j == 0 else out_dim
                adjust = curr not in config.depthwise_padding
                blocks.append(EfficientNetBlock(
                    config, bin_dim, out_dim, stride, config.kernel_sizes[i],
                    config.expand_ratios[i], id_skip, adjust, **kw))
                curr += 1
        self.blocks = blocks

    def __call__(self, params, x):
        for i, block in enumerate(self.blocks):
            x = block(params["blocks"][str(i)], x)
        return x


class AlignVisionModel(Module):
    """Reference modeling_align.py:917; pooled = global spatial mean."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = EfficientNetEmbeddings(config, **kw)
        self.encoder = _AlignVisionEncoder(config, **kw)

    def __call__(self, params, pixel_values):
        x = self.embeddings(params["embeddings"],
                            jnp.asarray(pixel_values, self.dtype))
        x = self.encoder(params["encoder"], x)
        return x, x.mean(axis=(2, 3))


class AlignPreTrainedModel(PreTrainedModel):
    config_class = AlignConfig
    base_model_prefix = ""
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked$",
                                          r"position_ids$")


class AlignModel(AlignPreTrainedModel):
    main_input_name = "input_ids"

    def __init__(self, config: AlignConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_model = BertModel(config.text_config, **kw)
        self.vision_model = AlignVisionModel(config.vision_config, **kw)
        self.text_projection = Linear(config.text_config.hidden_size,
                                      config.projection_dim, True, **kw)
        self.temperature_init_value = config.temperature_init_value

    def init(self, rng):
        params = super().init(rng)
        params["temperature"] = jnp.asarray(self.temperature_init_value,
                                            self.param_dtype)
        return params

    def get_text_features(self, params, input_ids, attention_mask=None,
                          token_type_ids=None, position_ids=None):
        out = self.text_model(params["text_model"], input_ids, attention_mask,
                              token_type_ids, position_ids)
        return self.text_projection(params["text_projection"],
                                    out.last_hidden_state[:, 0])

    def get_image_features(self, params, pixel_values):
        _, pooled = self.vision_model(params["vision_model"], pixel_values)
        return pooled

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, token_type_ids=None, position_ids=None,
                 return_loss=False, **kwargs) -> AlignOutput:
        vision_hidden, image_embeds = self.vision_model(params["vision_model"],
                                                        pixel_values)
        text_out = self.text_model(params["text_model"], input_ids,
                                   attention_mask, token_type_ids, position_ids)
        text_embeds = self.text_projection(params["text_projection"],
                                           text_out.last_hidden_state[:, 0])
        image_embeds = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
        text_embeds = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
        logits_per_text = jnp.dot(text_embeds.astype(jnp.float32),
                                  image_embeds.astype(jnp.float32).T)
        logits_per_text = logits_per_text / params["temperature"].astype(jnp.float32)
        logits_per_image = logits_per_text.T
        loss = None
        if return_loss:
            from ...loss import cross_entropy

            labels = jnp.arange(logits_per_text.shape[0])
            loss = (cross_entropy(logits_per_text, labels)
                    + cross_entropy(logits_per_image, labels)) / 2.0
        return AlignOutput(loss=loss, logits_per_image=logits_per_image,
                           logits_per_text=logits_per_text,
                           text_embeds=text_embeds, image_embeds=image_embeds,
                           text_model_output=text_out,
                           vision_model_output=vision_hidden)
