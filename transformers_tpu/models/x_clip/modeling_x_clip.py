"""X-CLIP, TPU-native (reference src/transformers/models/x_clip/modeling_x_clip.py).

Video-text contrastive model built on CLIP: per-frame ViT layers exchange a
*message token* across frames every layer (reference CrossFramelAttentionBlock,
modeling_x_clip.py:358), frame CLS features run through a tiny multi-frame
integration transformer (MIT, :764), and a cross-attention prompt generator
conditions the text embeddings on the video (:883). Logits are per-(video,
text) pairs via a batched einsum.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from ..clip.modeling_clip import (CLIPEncoder, CLIPEncoderLayer, CLIPMLP,
                                  CLIPAttention, CLIPTextTransformer)
from .configuration_x_clip import XCLIPConfig


@dataclass
class XCLIPOutput(ModelOutput):
    loss: Any = None
    logits_per_video: Any = None
    logits_per_text: Any = None
    text_embeds: Any = None
    video_embeds: Any = None
    text_model_output: Any = None
    vision_model_output: Any = None
    mit_output: Any = None


class XCLIPVisionEmbeddings(Module):
    """class token + bias-free conv patches + learned positions
    (reference modeling_x_clip.py:86)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_size = config.patch_size
        self.num_positions = (config.image_size // config.patch_size) ** 2 + 1
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(0.02))
        self.position_embedding = Embedding(self.num_positions,
                                            config.hidden_size, **kw)

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        c = self.config
        return {
            "class_embedding": normal_init(0.02)(k1, (c.hidden_size,), self.param_dtype),
            "patch_embedding": {"weight": normal_init(0.02)(
                k2, (c.hidden_size, c.num_channels, c.patch_size, c.patch_size),
                self.param_dtype)},
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
        cls = jnp.broadcast_to(params["class_embedding"].astype(self.dtype)[None, None, :],
                               (b, 1, patches.shape[-1]))
        x = jnp.concatenate([cls, patches], axis=1)
        pos_ids = jnp.arange(self.num_positions, dtype=jnp.int32)[None, :]
        return x + self.position_embedding(params["position_embedding"], pos_ids)


class XCLIPVisionEncoderLayer(Module):
    """Cross-frame message token + in-frame attention
    (reference modeling_x_clip.py:358)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.num_frames = config.num_frames
        self.self_attn = CLIPAttention(config, **kw)
        self.layer_norm1 = LayerNorm(d, config.layer_norm_eps, **kw)
        self.mlp = CLIPMLP(config, **kw)
        self.layer_norm2 = LayerNorm(d, config.layer_norm_eps, **kw)
        self.message_fc = Linear(d, d, True, **kw)
        self.message_ln = LayerNorm(d, config.layer_norm_eps, **kw)
        self.message_attn = CLIPAttention(config, **kw)

    def __call__(self, params, hidden):
        bt, s, d = hidden.shape
        b = bt // self.num_frames
        attn_args = {"is_causal": False}
        msg = self.message_fc(params["message_fc"], hidden[:, 0])
        msg = msg.reshape(b, self.num_frames, d)
        msg = msg + self.message_attn(params["message_attn"],
                                      self.message_ln(params["message_ln"], msg),
                                      attn_args)
        msg = msg.reshape(bt, 1, d)
        x = jnp.concatenate([hidden, msg], axis=1)
        h = self.self_attn(params["self_attn"],
                           self.layer_norm1(params["layer_norm1"], x), attn_args)
        x = (x + h)[:, :s]
        return x + self.mlp(params["mlp"], self.layer_norm2(params["layer_norm2"], x))


class XCLIPVisionModel(Module):
    """Flat ViT tower (reference modeling_x_clip.py:647): pre_layernorm on
    embeddings, post_layernorm on the CLS pooled state only."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.embeddings = XCLIPVisionEmbeddings(config, **kw)
        self.encoder = _XCLIPVisionEncoder(config, **kw)
        self.pre_layernorm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.post_layernorm = LayerNorm(d, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values):
        h = self.embeddings(params["embeddings"],
                            jnp.asarray(pixel_values, self.dtype))
        h = self.pre_layernorm(params["pre_layernorm"], h)
        for i, layer in enumerate(self.encoder.layers):
            h = layer(params["encoder"]["layers"][str(i)], h)
        pooled = self.post_layernorm(params["post_layernorm"], h[:, 0:1])[:, 0]
        return h, pooled


class _XCLIPVisionEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = [XCLIPVisionEncoderLayer(config, dtype=dtype,
                                               param_dtype=param_dtype)
                       for _ in range(config.num_hidden_layers)]


class XCLIPMultiframeIntegrationTransformer(Module):
    """Reference modeling_x_clip.py:764."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_frames = config.num_frames
        self.hidden_size = config.hidden_size
        self.encoder = CLIPEncoder(config, dtype=dtype, param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        params["position_embedding"] = jnp.zeros(
            (1, self.num_frames, self.hidden_size), self.param_dtype)
        return params

    def __call__(self, params, hidden):
        residual = hidden
        h = hidden + params["position_embedding"].astype(hidden.dtype)
        h, _ = self.encoder(params["encoder"], h, {"is_causal": False})
        h = h + residual
        return h, h.mean(axis=1)


class XCLIPCrossAttention(Module):
    """Bias-free q/k/v cross attention (reference modeling_x_clip.py:801)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.projection_dim
        self.num_heads = config.prompt_num_attention_heads
        self.head_dim = d // self.num_heads
        self.scale = self.head_dim ** -0.5
        self.q_proj = Linear(d, d, False, **kw)
        self.k_proj = Linear(d, d, False, **kw)
        self.v_proj = Linear(d, d, False, **kw)
        self.proj = Linear(d, d, True, **kw)

    def __call__(self, params, queries, keys):
        b, sq, d = queries.shape
        sk = keys.shape[1]
        q = self.q_proj(params["q_proj"], queries).reshape(b, sq, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], keys).reshape(b, sk, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], keys).reshape(b, sk, self.num_heads, self.head_dim)
        w = jnp.einsum("bqhd,bkhd->bhqk", q, k) * self.scale
        p = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(queries.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, sq, d)
        return self.proj(params["proj"], out)


class _PromptMLP(Module):
    """nn.Sequential(Linear, act, Dropout, Linear) -> keys 0/3."""

    def __init__(self, dim, act, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "0", Linear(dim, dim * 4, True, **kw))
        setattr(self, "3", Linear(dim * 4, dim, True, **kw))
        self.act = get_activation(act)

    def __call__(self, params, x):
        return getattr(self, "3")(params["3"],
                                  self.act(getattr(self, "0")(params["0"], x)))


class PromptGeneratorLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.projection_dim
        self.cross_attn = XCLIPCrossAttention(config, **kw)
        self.norm1 = LayerNorm(d, config.text_config.layer_norm_eps, **kw)
        self.norm3 = LayerNorm(d, config.text_config.layer_norm_eps, **kw)
        self.mlp = _PromptMLP(d, config.prompt_hidden_act, **kw)

    def __call__(self, params, hidden, visual):
        hidden = hidden + self.cross_attn(params["cross_attn"],
                                          self.norm1(params["norm1"], hidden),
                                          visual)
        return hidden + self.mlp(params["mlp"], self.norm3(params["norm3"], hidden))


class XCLIPPromptGenerator(Module):
    """Reference modeling_x_clip.py:883."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.projection_dim
        self.layernorm = LayerNorm(d, config.vision_config.layer_norm_eps, **kw)
        self.decoder = [PromptGeneratorLayer(config, **kw)
                        for _ in range(config.prompt_layers)]
        self.dim = d
        self.prompt_alpha = config.prompt_alpha

    def init(self, rng):
        params = super().init(rng)
        params["alpha"] = jnp.full((self.dim,), self.prompt_alpha, self.param_dtype)
        return params

    def __call__(self, params, text, visual):
        visual = self.layernorm(params["layernorm"], visual)
        for i, layer in enumerate(self.decoder):
            text = layer(params["decoder"][str(i)], text, visual)
        return params["alpha"].astype(text.dtype) * text


class XCLIPPreTrainedModel(PreTrainedModel):
    config_class = XCLIPConfig
    base_model_prefix = ""
    _keys_to_ignore_on_load_unexpected = (r"position_ids$",)


class XCLIPModel(XCLIPPreTrainedModel):
    """Reference modeling_x_clip.py:914."""

    main_input_name = "input_ids"

    def __init__(self, config: XCLIPConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        import copy

        self.text_model = CLIPTextTransformer(config.text_config, **kw)
        self.text_model.eos_token_id = 2  # reference forces legacy pooling
        self.vision_model = XCLIPVisionModel(config.vision_config, **kw)
        self.visual_projection = Linear(config.vision_config.hidden_size,
                                        config.projection_dim, False, **kw)
        self.text_projection = Linear(config.text_config.hidden_size,
                                      config.projection_dim, False, **kw)
        self.prompts_visual_layernorm = LayerNorm(
            config.vision_config.hidden_size,
            config.vision_config.layer_norm_eps, **kw)
        mit_config = copy.copy(config.vision_config)
        mit_config.hidden_size = config.vision_config.mit_hidden_size
        mit_config.intermediate_size = config.vision_config.mit_intermediate_size
        mit_config.num_hidden_layers = config.vision_config.mit_num_hidden_layers
        mit_config.num_attention_heads = config.vision_config.mit_num_attention_heads
        self.mit = XCLIPMultiframeIntegrationTransformer(mit_config, **kw)
        self.prompts_generator = XCLIPPromptGenerator(config, **kw)
        self.logit_scale_init_value = config.logit_scale_init_value
        self.vision_dim = config.vision_config.hidden_size
        self.projection_dim = config.projection_dim

    def init(self, rng):
        params = super().init(rng)
        params["logit_scale"] = jnp.asarray(self.logit_scale_init_value,
                                            self.param_dtype)
        params["prompts_visual_projection"] = normal_init(1.0)(
            jax.random.key(0), (self.vision_dim, self.projection_dim),
            self.param_dtype)
        return params

    def get_text_features(self, params, input_ids, attention_mask=None):
        out = self.text_model(params["text_model"], input_ids, attention_mask)
        return self.text_projection(params["text_projection"], out.pooler_output)

    def get_video_features(self, params, pixel_values):
        b, t = pixel_values.shape[:2]
        flat = pixel_values.reshape((-1,) + pixel_values.shape[2:])
        _, pooled = self.vision_model(params["vision_model"], flat)
        video = self.visual_projection(params["visual_projection"], pooled)
        _, video = self.mit(params["mit"], video.reshape(b, t, -1))
        return video

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, position_ids=None, return_loss=False,
                 **kwargs) -> XCLIPOutput:
        b, t = pixel_values.shape[:2]
        flat = jnp.reshape(pixel_values, (-1,) + pixel_values.shape[2:])
        vision_hidden, vision_pooled = self.vision_model(params["vision_model"], flat)
        video_embeds = self.visual_projection(params["visual_projection"],
                                              vision_pooled)
        cls_features = video_embeds.reshape(b, t, -1)
        mit_hidden, video_embeds = self.mit(params["mit"], cls_features)

        img_features = vision_hidden[:, 1:]
        img_features = self.prompts_visual_layernorm(
            params["prompts_visual_layernorm"], img_features)
        img_features = jnp.dot(img_features,
                               params["prompts_visual_projection"].astype(img_features.dtype))
        img_features = img_features.reshape(b, t, -1, video_embeds.shape[-1])
        img_features = img_features.mean(axis=1)

        text_out = self.text_model(params["text_model"], input_ids,
                                   attention_mask, position_ids)
        text_embeds = self.text_projection(params["text_projection"],
                                           text_out.pooler_output)
        text_embeds = jnp.broadcast_to(text_embeds[None],
                                       (b,) + text_embeds.shape)
        text_embeds = text_embeds + self.prompts_generator(
            params["prompts_generator"], text_embeds, img_features)

        video_embeds = video_embeds / jnp.linalg.norm(video_embeds, axis=-1, keepdims=True)
        text_embeds = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
        logit_scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        logits_per_video = jnp.einsum(
            "bd,bkd->bk", video_embeds.astype(jnp.float32),
            logit_scale * text_embeds.astype(jnp.float32))
        logits_per_text = logits_per_video.T
        loss = None
        if return_loss:
            from ...loss import cross_entropy

            labels = jnp.arange(logits_per_text.shape[0])
            loss = (cross_entropy(logits_per_text, labels)
                    + cross_entropy(logits_per_video, labels)) / 2.0
        return XCLIPOutput(loss=loss, logits_per_video=logits_per_video,
                           logits_per_text=logits_per_text,
                           text_embeds=text_embeds, video_embeds=video_embeds,
                           text_model_output=text_out,
                           vision_model_output=vision_hidden,
                           mit_output=mit_hidden)
