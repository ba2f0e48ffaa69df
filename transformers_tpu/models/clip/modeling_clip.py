"""CLIP, TPU-native (reference src/transformers/models/clip/modeling_clip.py:
text encoder :494, vision encoder :594, projections :835/:898, contrastive
forward :676/:815).

Dual pre-norm towers + projections; the fused similarity (normalize ->
logit_scale * t @ v.T) jits into one program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ...utils.generic import ModelOutput
from .configuration_clip import CLIPConfig, CLIPTextConfig, CLIPVisionConfig
from dataclasses import dataclass


@dataclass
class CLIPOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits_per_image: Optional[jnp.ndarray] = None
    logits_per_text: Optional[jnp.ndarray] = None
    text_embeds: Optional[jnp.ndarray] = None
    image_embeds: Optional[jnp.ndarray] = None
    text_model_output: Optional[BaseModelOutputWithPooling] = None
    vision_model_output: Optional[BaseModelOutputWithPooling] = None


class CLIPAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.q_proj = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.k_proj = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.v_proj = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.out_proj = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def __call__(self, params, hidden, attn_args):
        b, s, e = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.head_dim**-0.5, **attn_args)
        return self.out_proj(params["out_proj"], out.reshape(b, s, e))


class CLIPMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.fc1 = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class CLIPEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = CLIPAttention(config, **kw)
        self.layer_norm1 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.mlp = CLIPMLP(config, **kw)
        self.layer_norm2 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, attn_args):
        h = self.self_attn(params["self_attn"], self.layer_norm1(params["layer_norm1"], hidden), attn_args)
        hidden = hidden + h
        h = self.mlp(params["mlp"], self.layer_norm2(params["layer_norm2"], hidden))
        return hidden + h


class CLIPEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = [CLIPEncoderLayer(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, attn_args, output_hidden_states=False):
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["layers"][str(i)], hidden, attn_args)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class CLIPTextEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, embedding_init=normal_init(0.02))
        self.token_embedding = Embedding(config.vocab_size, config.hidden_size, **kw)
        self.position_embedding = Embedding(config.max_position_embeddings, config.hidden_size, **kw)

    def __call__(self, params, input_ids, position_ids=None):
        s = input_ids.shape[1]
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :]
        return (self.token_embedding(params["token_embedding"], input_ids)
                + self.position_embedding(params["position_embedding"], position_ids))


class CLIPTextTransformer(Module):
    def __init__(self, config: CLIPTextConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = CLIPTextEmbeddings(config, **kw)
        self.encoder = CLIPEncoder(config, **kw)
        self.final_layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.eos_token_id = config.eos_token_id

    def _pool_index(self, input_ids):
        # Pooling (reference CLIPTextTransformer.forward): legacy configs with
        # eos_token_id == 2 pool at argmax(input_ids) (the eot token is the
        # highest id); updated configs pool at the first eos position.
        if self.eos_token_id == 2:
            return jnp.argmax(input_ids.astype(jnp.int32), axis=-1)
        is_eos = (input_ids == self.eos_token_id).astype(jnp.int32)
        return jnp.argmax(is_eos, axis=-1)

    def __call__(self, params, input_ids, attention_mask=None, position_ids=None,
                 output_hidden_states=False) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, position_ids)
        b, s, _ = hidden.shape
        # CLIP text uses a causal mask (reference modeling_clip.py text tower).
        q_positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}
        hidden, all_hidden = self.encoder(params["encoder"], hidden, attn_args, output_hidden_states)
        hidden = self.final_layer_norm(params["final_layer_norm"], hidden)
        idx = self._pool_index(input_ids)
        pooled = jnp.take_along_axis(hidden, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class CLIPVisionEmbeddings(Module):
    def __init__(self, config: CLIPVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_size = config.patch_size
        self.num_positions = (config.image_size // config.patch_size) ** 2 + 1
        kw = dict(dtype=dtype, param_dtype=param_dtype, embedding_init=normal_init(0.02))
        self.position_embedding = Embedding(self.num_positions, config.hidden_size, **kw)

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        c = self.config
        params = {
            "class_embedding": normal_init(0.02)(k1, (c.hidden_size,), self.param_dtype),
            # conv OIHW, no bias (reference CLIPVisionEmbeddings patch_embedding)
            "patch_embedding": {"weight": normal_init(0.02)(
                k2, (c.hidden_size, c.num_channels, c.patch_size, c.patch_size), self.param_dtype)},
            "position_embedding": self.position_embedding.init(k3),
        }
        return params

    def __call__(self, params, pixel_values):
        b, ch, hh, ww = pixel_values.shape
        p = self.patch_size
        gh, gw = hh // p, ww // p
        x = pixel_values.reshape(b, ch, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, ch * p * p)
        w = params["patch_embedding"]["weight"].astype(self.dtype)
        patches = jnp.dot(x.astype(self.dtype), w.reshape(w.shape[0], -1).T)
        cls = jnp.broadcast_to(params["class_embedding"].astype(self.dtype)[None, None, :],
                               (b, 1, patches.shape[-1]))
        x = jnp.concatenate([cls, patches], axis=1)
        pos_ids = jnp.arange(self.num_positions, dtype=jnp.int32)[None, :]
        return x + self.position_embedding(params["position_embedding"], pos_ids)


class CLIPVisionTransformer(Module):
    def __init__(self, config: CLIPVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = CLIPVisionEmbeddings(config, **kw)
        self.pre_layrnorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.encoder = CLIPEncoder(config, **kw)
        self.post_layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values, output_hidden_states=False) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], pixel_values)
        hidden = self.pre_layrnorm(params["pre_layrnorm"], hidden)
        attn_args = {"is_causal": False}
        hidden, all_hidden = self.encoder(params["encoder"], hidden, attn_args, output_hidden_states)
        pooled = self.post_layernorm(params["post_layernorm"], hidden[:, 0:1])[:, 0]
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class CLIPPreTrainedModel(PreTrainedModel):
    config_class = CLIPConfig
    base_model_prefix = ""


class CLIPModel(CLIPPreTrainedModel):
    """reference modeling_clip.py CLIPModel (contrastive dual encoder)."""

    main_input_name = "input_ids"

    def __init__(self, config: CLIPConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_model = CLIPTextTransformer(config.text_config, **kw)
        self.vision_model = CLIPVisionTransformer(config.vision_config, **kw)
        self.visual_projection = Linear(config.vision_config.hidden_size, config.projection_dim, False, **kw)
        self.text_projection = Linear(config.text_config.hidden_size, config.projection_dim, False, **kw)
        self.logit_scale_init_value = config.logit_scale_init_value

    def init(self, rng):
        params = super().init(rng)
        params["logit_scale"] = jnp.asarray(self.logit_scale_init_value, self.param_dtype)
        return params

    def get_text_features(self, params, input_ids, attention_mask=None):
        out = self.text_model(params["text_model"], input_ids, attention_mask)
        return self.text_projection(params["text_projection"], out.pooler_output)

    def get_image_features(self, params, pixel_values):
        out = self.vision_model(params["vision_model"], pixel_values)
        return self.visual_projection(params["visual_projection"], out.pooler_output)

    def __call__(self, params, input_ids=None, pixel_values=None, attention_mask=None,
                 position_ids=None, return_loss=False, **kwargs) -> CLIPOutput:
        vision_out = self.vision_model(params["vision_model"], pixel_values)
        text_out = self.text_model(params["text_model"], input_ids, attention_mask, position_ids)
        image_embeds = self.visual_projection(params["visual_projection"], vision_out.pooler_output)
        text_embeds = self.text_projection(params["text_projection"], text_out.pooler_output)

        image_embeds = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
        text_embeds = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)

        logit_scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        logits_per_text = jnp.dot(text_embeds.astype(jnp.float32),
                                  image_embeds.astype(jnp.float32).T) * logit_scale
        logits_per_image = logits_per_text.T
        loss = None
        if return_loss:
            # CLIP contrastive loss (reference clip_loss)
            labels = jnp.arange(logits_per_text.shape[0])
            from ...loss import cross_entropy

            loss = (cross_entropy(logits_per_text, labels) + cross_entropy(logits_per_image, labels)) / 2.0
        return CLIPOutput(
            loss=loss, logits_per_image=logits_per_image, logits_per_text=logits_per_text,
            text_embeds=text_embeds, image_embeds=image_embeds,
            text_model_output=text_out, vision_model_output=vision_out,
        )


class CLIPVisionModel(CLIPPreTrainedModel):
    """Standalone vision tower (reference modeling_clip.py CLIPVisionModel) —
    the LLaVA-family building block."""

    config_class = CLIPVisionConfig
    base_model_prefix = "vision_model"
    main_input_name = "pixel_values"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.vision_model = CLIPVisionTransformer(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.vision_model(params["vision_model"], pixel_values, **kwargs)
