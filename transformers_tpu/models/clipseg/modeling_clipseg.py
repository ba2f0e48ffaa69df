"""CLIPSeg (reference models/clipseg/modeling_clipseg.py): zero-shot image
segmentation — a CLIP dual encoder conditions a lightweight post-norm
transformer decoder via FiLM on the text (or prompt-image) embedding, reading
skip activations from chosen ViT layers and up-convolving to a mask."""

from __future__ import annotations

import copy
import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ...core.module import ConvTranspose, Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, ModelOutput
from ...modeling_utils import PreTrainedModel
from ..clip.modeling_clip import (
    CLIPAttention,
    CLIPEncoder,
    CLIPMLP,
    CLIPTextTransformer,
    CLIPVisionTransformer,
)
from ..luke.modeling_luke import _Container
from .configuration_clipseg import CLIPSegConfig, CLIPSegTextConfig, CLIPSegVisionConfig


@dataclass
class CLIPSegImageSegmentationOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None
    conditional_embeddings: Optional[jnp.ndarray] = None
    pooled_output: Optional[jnp.ndarray] = None
    vision_model_output: Optional[Any] = None
    decoder_output: Optional[Any] = None


@dataclass
class CLIPSegOutput(ModelOutput):
    logits_per_image: Optional[jnp.ndarray] = None
    logits_per_text: Optional[jnp.ndarray] = None
    text_embeds: Optional[jnp.ndarray] = None
    image_embeds: Optional[jnp.ndarray] = None


class CLIPSegDecoderLayer(Module):
    """Post-norm variant of the CLIP encoder layer (reference
    CLIPSegDecoderLayer)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = CLIPAttention(config, **kw)
        self.layer_norm1 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.mlp = CLIPMLP(config, **kw)
        self.layer_norm2 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, attn_args):
        h = self.self_attn(params["self_attn"], hidden, attn_args)
        hidden = self.layer_norm1(params["layer_norm1"], hidden + h)
        h = self.mlp(params["mlp"], hidden)
        return self.layer_norm2(params["layer_norm2"], hidden + h)


class CLIPSegDecoder(Module):
    def __init__(self, config: CLIPSegConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(0.02))
        self.conditional_layer = config.conditional_layer
        self.film_mul = Linear(config.projection_dim, config.reduce_dim, True, **lkw)
        self.film_add = Linear(config.projection_dim, config.reduce_dim, True, **lkw)
        self.use_complex = config.use_complex_transposed_convolution
        p = config.vision_config.patch_size
        if self.use_complex:
            tk = p // 4
            self.transposed_convolution = _Container({
                "0": Conv(config.reduce_dim, config.reduce_dim, 3, padding=1,
                          ndim=2, **kw),
                "2": ConvTranspose(config.reduce_dim, config.reduce_dim // 2,
                                   tk, stride=tk, **kw),
                "4": ConvTranspose(config.reduce_dim // 2, 1, tk, stride=tk, **kw),
            }, **kw)
        else:
            self.transposed_convolution = ConvTranspose(config.reduce_dim, 1,
                                                        p, stride=p, **kw)
        depth = len(config.extract_layers)
        self.reduces = [Linear(config.vision_config.hidden_size,
                               config.reduce_dim, True, **lkw)
                        for _ in range(depth)]
        dec_cfg = copy.deepcopy(config.vision_config)
        dec_cfg.hidden_size = config.reduce_dim
        dec_cfg.num_attention_heads = config.decoder_num_attention_heads
        dec_cfg.intermediate_size = config.decoder_intermediate_size
        dec_cfg.hidden_act = "relu"
        self.layers = [CLIPSegDecoderLayer(dec_cfg, **kw) for _ in range(depth)]

    def __call__(self, params, hidden_states, conditional_embeddings):
        activations = hidden_states[::-1]
        output = None
        attn_args = {"is_causal": False}
        for i, (act, layer, reduce) in enumerate(
                zip(activations, self.layers, self.reduces)):
            red = reduce(params["reduces"][str(i)], act)
            output = red if output is None else red + output
            if i == self.conditional_layer:
                mul = self.film_mul(params["film_mul"], conditional_embeddings)
                add = self.film_add(params["film_add"], conditional_embeddings)
                output = mul[:, None, :] * output + add[:, None, :]
            output = layer(params["layers"][str(i)], output, attn_args)
        output = output[:, 1:, :].transpose(0, 2, 1)  # drop CLS, [B, C, S]
        size = int(math.sqrt(output.shape[2]))
        b = conditional_embeddings.shape[0]
        output = output.reshape(b, output.shape[1], size, size)
        if self.use_complex:
            mods = self.transposed_convolution._children
            p = params["transposed_convolution"]
            h = jax.nn.relu(mods["0"](p["0"], output))
            h = jax.nn.relu(mods["2"](p["2"], h))
            logits = mods["4"](p["4"], h)
        else:
            logits = self.transposed_convolution(
                params["transposed_convolution"], output)
        return logits[:, 0]


class CLIPSegPreTrainedModel(PreTrainedModel):
    config_class = CLIPSegConfig
    _keys_to_ignore_on_load_unexpected = (r"position_ids$",)


class _CLIPSegClip(Module):
    """clip.* subtree (CLIPSegModel analog)."""

    def __init__(self, config: CLIPSegConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.text_model = CLIPTextTransformer(config.text_config, **kw)
        self.vision_model = CLIPVisionTransformer(config.vision_config, **kw)
        self.visual_projection = Linear(config.vision_config.hidden_size,
                                        config.projection_dim, False,
                                        kernel_init=normal_init(0.02), **kw)
        self.text_projection = Linear(config.text_config.hidden_size,
                                      config.projection_dim, False,
                                      kernel_init=normal_init(0.02), **kw)
        self.logit_scale_init_value = config.logit_scale_init_value

    def init(self, rng):
        params = super().init(rng)
        params["logit_scale"] = jnp.asarray(self.logit_scale_init_value,
                                            self.param_dtype)
        return params

    def get_text_features(self, params, input_ids, attention_mask=None,
                          position_ids=None):
        out = self.text_model(params["text_model"], jnp.asarray(input_ids),
                              attention_mask, position_ids)
        return self.text_projection(params["text_projection"], out.pooler_output)

    def get_image_features(self, params, pixel_values,
                           output_hidden_states=False):
        out = self.vision_model(params["vision_model"],
                                jnp.asarray(pixel_values, self.dtype),
                                output_hidden_states=output_hidden_states)
        pooled = self.visual_projection(params["visual_projection"],
                                        out.pooler_output)
        return pooled, out


class CLIPSegModel(CLIPSegPreTrainedModel):
    main_input_name = "input_ids"

    def __init__(self, config: CLIPSegConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        core = _CLIPSegClip(config, dtype=self.dtype, param_dtype=self.param_dtype)
        for name, child in core._children.items():
            setattr(self, name, child)
        self._core = core
        self._children.pop("_core", None)

    def init(self, rng):
        return self._core.init(rng)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, **kwargs) -> CLIPSegOutput:
        text_embeds = self._core.get_text_features(params, input_ids,
                                                   attention_mask)
        image_embeds, _ = self._core.get_image_features(params, pixel_values)
        image_embeds = image_embeds / jnp.linalg.norm(image_embeds, axis=-1,
                                                      keepdims=True)
        text_embeds = text_embeds / jnp.linalg.norm(text_embeds, axis=-1,
                                                    keepdims=True)
        scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        logits_per_text = (text_embeds @ image_embeds.T) * scale
        return CLIPSegOutput(logits_per_image=logits_per_text.T,
                             logits_per_text=logits_per_text,
                             text_embeds=text_embeds, image_embeds=image_embeds)


class CLIPSegForImageSegmentation(CLIPSegPreTrainedModel):
    main_input_name = "pixel_values"

    def __init__(self, config: CLIPSegConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.clip = _CLIPSegClip(config, **kw)
        self.extract_layers = config.extract_layers
        self.decoder = CLIPSegDecoder(config, **kw)

    def get_conditional_embeddings(self, params, batch_size=None,
                                   input_ids=None, attention_mask=None,
                                   position_ids=None,
                                   conditional_pixel_values=None):
        if input_ids is not None:
            return self.clip.get_text_features(params["clip"], input_ids,
                                               attention_mask, position_ids)
        if conditional_pixel_values is not None:
            pooled, _ = self.clip.get_image_features(params["clip"],
                                                     conditional_pixel_values)
            return pooled
        raise ValueError("provide input_ids or conditional_pixel_values")

    def __call__(self, params, input_ids=None, pixel_values=None,
                 conditional_pixel_values=None, conditional_embeddings=None,
                 attention_mask=None, position_ids=None, labels=None,
                 **kwargs) -> CLIPSegImageSegmentationOutput:
        pooled, vision_outputs = self.clip.get_image_features(
            params["clip"], pixel_values, output_hidden_states=True)
        hidden_states = vision_outputs.hidden_states
        activations = [hidden_states[i + 1] for i in self.extract_layers]
        if conditional_embeddings is None:
            conditional_embeddings = self.get_conditional_embeddings(
                params, batch_size=jnp.asarray(pixel_values).shape[0],
                input_ids=input_ids, attention_mask=attention_mask,
                position_ids=position_ids,
                conditional_pixel_values=conditional_pixel_values)
        logits = self.decoder(params["decoder"], activations,
                              conditional_embeddings)
        loss = None
        if labels is not None:
            lb = jnp.asarray(labels, jnp.float32)
            lg = logits.astype(jnp.float32)
            loss = jnp.mean(jnp.maximum(lg, 0) - lg * lb
                            + jnp.log1p(jnp.exp(-jnp.abs(lg))))
        return CLIPSegImageSegmentationOutput(
            loss=loss, logits=logits,
            conditional_embeddings=conditional_embeddings,
            pooled_output=pooled, vision_model_output=vision_outputs)
