"""SigLIP, TPU-native (reference src/transformers/models/siglip/modeling_siglip.py).

CLIP-style dual towers with sigmoid-loss heads: no CLS token (attention-pool
probe head on vision), bidirectional text attention with last-token pooling +
linear head, learned logit_scale AND logit_bias.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ...utils.generic import ModelOutput
from ..clip.modeling_clip import CLIPEncoder, CLIPMLP
from .configuration_siglip import SiglipConfig, SiglipTextConfig, SiglipVisionConfig


@dataclass
class SiglipOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits_per_image: Optional[jnp.ndarray] = None
    logits_per_text: Optional[jnp.ndarray] = None
    text_embeds: Optional[jnp.ndarray] = None
    image_embeds: Optional[jnp.ndarray] = None
    text_model_output: Optional[BaseModelOutputWithPooling] = None
    vision_model_output: Optional[BaseModelOutputWithPooling] = None


class SiglipTextEmbeddings(Module):
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


class SiglipTextTransformer(Module):
    """reference SiglipTextTransformer: bidirectional, last-token pool + head."""

    def __init__(self, config: SiglipTextConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = SiglipTextEmbeddings(config, **kw)
        self.encoder = CLIPEncoder(config, **kw)
        self.final_layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.head = Linear(config.hidden_size, config.projection_size, True, **kw)

    def __call__(self, params, input_ids, attention_mask=None, position_ids=None,
                 output_hidden_states=False) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, position_ids)
        b, s, _ = hidden.shape
        attn_args = {"is_causal": False}
        if attention_mask is not None:
            attn_args["kv_valid"] = attention_mask
        hidden, all_hidden = self.encoder(params["encoder"], hidden, attn_args, output_hidden_states)
        hidden = self.final_layer_norm(params["final_layer_norm"], hidden)
        pooled = hidden[:, -1, :]
        pooled = self.head(params["head"], pooled)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class SiglipVisionEmbeddings(Module):
    """Patch conv (with bias) + learned positions; no CLS token."""

    def __init__(self, config: SiglipVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_size = config.patch_size
        self.num_positions = (config.image_size // config.patch_size) ** 2
        kw = dict(dtype=dtype, param_dtype=param_dtype, embedding_init=normal_init(0.02))
        self.position_embedding = Embedding(self.num_positions, config.hidden_size, **kw)

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        c = self.config
        return {
            "patch_embedding": {
                "weight": normal_init(0.02)(k1, (c.hidden_size, c.num_channels, c.patch_size, c.patch_size),
                                            self.param_dtype),
                "bias": jnp.zeros((c.hidden_size,), self.param_dtype),
            },
            "position_embedding": self.position_embedding.init(k3),
        }

    def __call__(self, params, pixel_values):
        b, ch, hh, ww = pixel_values.shape
        p = self.patch_size
        gh, gw = hh // p, ww // p
        x = pixel_values.reshape(b, ch, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, ch * p * p)
        w = params["patch_embedding"]["weight"].astype(self.dtype)
        patches = jnp.dot(x.astype(self.dtype), w.reshape(w.shape[0], -1).T)
        patches = patches + params["patch_embedding"]["bias"].astype(self.dtype)
        pos_ids = jnp.arange(self.num_positions, dtype=jnp.int32)[None, :]
        return patches + self.position_embedding(params["position_embedding"], pos_ids)


class SiglipMultiheadAttentionPoolingHead(Module):
    """Probe-query attention pooling (reference
    SiglipMultiheadAttentionPoolingHead, torch nn.MultiheadAttention layout:
    attention.in_proj_weight [3E, E], attention.out_proj)."""

    def __init__(self, config: SiglipVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.mlp = CLIPMLP(config, **kw)

    def init(self, rng):
        params = super().init(rng)
        e = self.config.hidden_size
        k1, k2, k3 = jax.random.split(rng, 3)
        params["probe"] = normal_init(0.02)(k1, (1, 1, e), self.param_dtype)
        params["attention"] = {
            # torch nn.MultiheadAttention param names kept for hub parity
            "in_proj_weight": normal_init(0.02)(k2, (3 * e, e), self.param_dtype),
            "in_proj_bias": jnp.zeros((3 * e,), self.param_dtype),
            "out_proj": {
                "weight": normal_init(0.02)(k3, (e, e), self.param_dtype),
                "bias": jnp.zeros((e,), self.param_dtype),
            },
        }
        return params

    def __call__(self, params, hidden):  # hidden [B, S, E]
        b, s, e = hidden.shape
        attn = params["attention"]
        w = attn["in_proj_weight"].astype(self.dtype)  # [3E, E] (torch layout)
        bproj = attn["in_proj_bias"].astype(self.dtype)
        wq, wk, wv = w[:e], w[e : 2 * e], w[2 * e :]
        bq, bk, bv = bproj[:e], bproj[e : 2 * e], bproj[2 * e :]
        probe = jnp.broadcast_to(params["probe"].astype(self.dtype), (b, 1, e))
        q = (jnp.dot(probe, wq.T) + bq).reshape(b, 1, self.num_heads, self.head_dim)
        k = (jnp.dot(hidden, wk.T) + bk).reshape(b, s, self.num_heads, self.head_dim)
        v = (jnp.dot(hidden, wv.T) + bv).reshape(b, s, self.num_heads, self.head_dim)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.head_dim**-0.5, is_causal=False).reshape(b, 1, e)
        out = jnp.dot(out, attn["out_proj"]["weight"].astype(self.dtype).T) + attn["out_proj"]["bias"].astype(self.dtype)
        residual = out
        out = self.layernorm(params["layernorm"], out)
        out = residual + self.mlp(params["mlp"], out)
        return out[:, 0]


class SiglipVisionTransformer(Module):
    def __init__(self, config: SiglipVisionConfig, *, dtype, param_dtype, use_head=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = SiglipVisionEmbeddings(config, **kw)
        self.encoder = CLIPEncoder(config, **kw)
        self.post_layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.head = SiglipMultiheadAttentionPoolingHead(config, **kw) if use_head else None

    def __call__(self, params, pixel_values, output_hidden_states=False) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], pixel_values)
        hidden, all_hidden = self.encoder(params["encoder"], hidden, {"is_causal": False},
                                          output_hidden_states)
        hidden = self.post_layernorm(params["post_layernorm"], hidden)
        pooled = None
        if self.head is not None and "head" in params:
            pooled = self.head(params["head"], hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class SiglipPreTrainedModel(PreTrainedModel):
    config_class = SiglipConfig
    base_model_prefix = ""


class SiglipModel(SiglipPreTrainedModel):
    def __init__(self, config: SiglipConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_model = SiglipTextTransformer(config.text_config, **kw)
        self.vision_model = SiglipVisionTransformer(config.vision_config, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["logit_scale"] = jnp.full((1,), 2.3026, self.param_dtype)  # log(10)
        params["logit_bias"] = jnp.full((1,), -10.0, self.param_dtype)
        return params

    def get_text_features(self, params, input_ids, attention_mask=None):
        return self.text_model(params["text_model"], input_ids, attention_mask).pooler_output

    def get_image_features(self, params, pixel_values):
        return self.vision_model(params["vision_model"], pixel_values).pooler_output

    def __call__(self, params, input_ids=None, pixel_values=None, attention_mask=None,
                 position_ids=None, return_loss=False, **kwargs) -> SiglipOutput:
        vision_out = self.vision_model(params["vision_model"], pixel_values)
        text_out = self.text_model(params["text_model"], input_ids, attention_mask, position_ids)
        image_embeds = vision_out.pooler_output
        text_embeds = text_out.pooler_output
        image_embeds = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
        text_embeds = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
        logit_scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        logits_per_text = (jnp.dot(text_embeds.astype(jnp.float32), image_embeds.astype(jnp.float32).T)
                           * logit_scale + params["logit_bias"].astype(jnp.float32))
        logits_per_image = logits_per_text.T
        loss = None
        if return_loss:
            # sigmoid loss (reference SiglipModel.forward)
            n = logits_per_text.shape[0]
            labels = 2.0 * jnp.eye(n) - jnp.ones((n, n))
            loglik = jax.nn.log_sigmoid(labels * logits_per_text)
            loss = -jnp.mean(jnp.sum(loglik, axis=-1))
        return SiglipOutput(
            loss=loss, logits_per_image=logits_per_image, logits_per_text=logits_per_text,
            text_embeds=text_embeds, image_embeds=image_embeds,
            text_model_output=text_out, vision_model_output=vision_out,
        )


class SiglipVisionModel(SiglipPreTrainedModel):
    """Standalone vision tower (VLM building block)."""

    config_class = SiglipVisionConfig
    base_model_prefix = "vision_model"
    main_input_name = "pixel_values"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.vision_model = SiglipVisionTransformer(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.vision_model(params["vision_model"], pixel_values, **kwargs)
