"""AIMv2 (reference models/aimv2/modeling_aimv2.py): CLIP-style dual encoder
with pre-RMSNorm SwiGLU transformer blocks — a patch encoder with learned (or
native 2-D sinusoidal) positions and an attention-pooling head, a causal text
encoder pooled at EOS, and clamped-temperature contrastive logits."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, Embedding, Linear, Module, ModuleList, RMSNorm, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..luke.modeling_luke import _Container
from .configuration_aimv2 import Aimv2Config, Aimv2TextConfig, Aimv2VisionConfig


@dataclass
class Aimv2Output(ModelOutput):
    logits_per_image: Optional[jnp.ndarray] = None
    logits_per_text: Optional[jnp.ndarray] = None
    text_embeds: Optional[jnp.ndarray] = None
    image_embeds: Optional[jnp.ndarray] = None
    text_model_output: Optional[Any] = None
    vision_model_output: Optional[Any] = None


def _sinusoidal_2d(h, w, dim):
    pos_dim = dim // 4
    omega = np.arange(pos_dim, dtype=np.float64) / pos_dim
    omega = 1.0 / 10000.0 ** omega
    gh, gw = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    eh = np.outer(gh.reshape(-1), omega)
    ew = np.outer(gw.reshape(-1), omega)
    pe = np.concatenate([np.sin(eh), np.cos(eh), np.sin(ew), np.cos(ew)], axis=1)
    half = pe.shape[-1] // 2
    # AIMv2 uses the [sin_w|cos_w|sin_h|cos_h] rotation (ViT-MAE convention)
    pe = np.concatenate([pe[:, half:], pe[:, :half]], axis=-1)
    return jnp.asarray(pe.astype(np.float32))


class Aimv2Attention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        d = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = d // config.num_attention_heads
        self.q_proj = Linear(d, d, config.qkv_bias, **kw)
        self.k_proj = Linear(d, d, config.qkv_bias, **kw)
        self.v_proj = Linear(d, d, config.qkv_bias, **kw)
        self.out_proj = Linear(d, d, config.qkv_bias, **kw)

    def __call__(self, params, hidden, attention_mask=None):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (self.head_dim ** -0.5)
        if attention_mask is not None:
            scores = scores + attention_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)
        return self.out_proj(params["out_proj"], out)


class Aimv2EncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        d, inter = config.hidden_size, config.intermediate_size
        self.attention = Aimv2Attention(config, **kw)
        self.ffn = _Container({
            "gate_proj": Linear(d, inter, config.mlp_bias, **lkw),
            "up_proj": Linear(d, inter, config.mlp_bias, **lkw),
            "down_proj": Linear(inter, d, config.mlp_bias, **lkw)}, **kw)
        self.rms_norm1 = RMSNorm(d, config.rms_norm_eps, **kw)
        self.rms_norm2 = RMSNorm(d, config.rms_norm_eps, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, attention_mask=None):
        h = self.attention(params["attention"],
                           self.rms_norm1(params["rms_norm1"], hidden),
                           attention_mask)
        hidden = hidden + h
        n = self.rms_norm2(params["rms_norm2"], hidden)
        mods = self.ffn._children
        p = params["ffn"]
        h = mods["down_proj"](p["down_proj"],
                              self.act(mods["gate_proj"](p["gate_proj"], n))
                              * mods["up_proj"](p["up_proj"], n))
        return hidden + h


class Aimv2Encoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = [Aimv2EncoderLayer(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, attention_mask=None):
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, attention_mask)
        return hidden


class Aimv2VisionEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_embed = Conv(config.num_channels, config.hidden_size,
                                config.patch_size, stride=config.patch_size,
                                ndim=2, **kw)
        self.rms_norm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        if not config.is_native:
            n = (config.image_size // config.patch_size) ** 2
            self.position_embedding = Embedding(n, config.hidden_size, **kw)

    def __call__(self, params, pixel_values):
        h = self.patch_embed(params["patch_embed"], pixel_values)
        ph, pw = h.shape[2], h.shape[3]
        h = h.reshape(h.shape[0], h.shape[1], -1).transpose(0, 2, 1)
        h = self.rms_norm(params["rms_norm"], h)
        if self.config.is_native:
            pe = _sinusoidal_2d(ph, pw, self.config.hidden_size)[None]
        else:
            pe = params["position_embedding"]["weight"][None]
        return h + pe.astype(h.dtype)


class Aimv2AttentionPoolingHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        d = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.hidden_size = d
        self.k_proj = Linear(d, d, config.qkv_bias, **kw)
        self.v_proj = Linear(d, d, config.qkv_bias, **kw)
        self.output_proj = Linear(d, d, True, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["cls_token"] = jnp.zeros((1, 1, self.hidden_size), self.param_dtype)
        return params

    def __call__(self, params, hidden):
        b, s, d = hidden.shape
        hd = d // self.num_heads
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, hd)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, hd)
        q = jnp.broadcast_to(params["cls_token"].astype(hidden.dtype), (b, 1, d))
        q = q.reshape(b, 1, self.num_heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, 1, d)[:, 0]
        return self.output_proj(params["output_proj"], out)


class Aimv2PreTrainedModel(PreTrainedModel):
    config_class = Aimv2Config
    _keys_to_ignore_on_load_unexpected = (r"position_ids$",)


class Aimv2VisionModelModule(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = Aimv2VisionEmbeddings(config, **kw)
        self.encoder = Aimv2Encoder(config, **kw)
        self.rms_norm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.use_head = config.use_head
        if self.use_head:
            self.head = Aimv2AttentionPoolingHead(config, **kw)

    def __call__(self, params, pixel_values):
        h = self.embeddings(params["embeddings"], pixel_values)
        h = self.encoder(params["encoder"], h)
        h = self.rms_norm(params["rms_norm"], h)
        pooled = self.head(params["head"], h) if self.use_head else None
        return BaseModelOutputWithPooling(last_hidden_state=h,
                                          pooler_output=pooled)


class Aimv2TextModelModule(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = _Container({
            "token_embedding": Embedding(config.vocab_size, config.hidden_size, **kw),
            "position_embedding": Embedding(config.max_position_embeddings,
                                            config.hidden_size, **kw)}, **kw)
        self.encoder = Aimv2Encoder(config, **kw)
        self.rms_norm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.eos_token_id = config.eos_token_id

    def __call__(self, params, input_ids, attention_mask=None):
        ids = jnp.asarray(input_ids)
        b, s = ids.shape
        emb = self.embeddings._children
        p = params["embeddings"]
        h = emb["token_embedding"](p["token_embedding"], ids)
        h = h + emb["position_embedding"](p["position_embedding"],
                                          jnp.arange(s, dtype=jnp.int32)[None])
        # hub AIMv2 text encoder is bidirectional: padding mask only
        mask = None
        if attention_mask is not None:
            pad = jnp.asarray(attention_mask)[:, None, None, :].astype(jnp.float32)
            mask = (1.0 - pad) * jnp.finfo(jnp.float32).min
        h = self.encoder(params["encoder"], h, mask)
        h = self.rms_norm(params["rms_norm"], h)
        eos_pos = jnp.argmax((ids == self.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = h[jnp.arange(b), eos_pos]
        return BaseModelOutputWithPooling(last_hidden_state=h,
                                          pooler_output=pooled)


class Aimv2VisionModel(Aimv2PreTrainedModel):
    config_class = Aimv2VisionConfig
    main_input_name = "pixel_values"

    def __init__(self, config: Aimv2VisionConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        core = Aimv2VisionModelModule(config, **kw)
        for name, child in core._children.items():
            setattr(self, name, child)
        self.use_head = config.use_head
        self._core = core
        self._children.pop("_core", None)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self._core(params, jnp.asarray(pixel_values, self.dtype))


class Aimv2TextModel(Aimv2PreTrainedModel):
    config_class = Aimv2TextConfig
    main_input_name = "input_ids"

    def __init__(self, config: Aimv2TextConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        core = Aimv2TextModelModule(config, **kw)
        for name, child in core._children.items():
            setattr(self, name, child)
        self._core = core
        self._children.pop("_core", None)

    def __call__(self, params, input_ids=None, attention_mask=None, **kwargs):
        return self._core(params, input_ids, attention_mask)


class Aimv2Model(Aimv2PreTrainedModel):
    main_input_name = "input_ids"

    def __init__(self, config: Aimv2Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vision_model = Aimv2VisionModelModule(config.vision_config, **kw)
        self.text_model = Aimv2TextModelModule(config.text_config, **kw)
        self.visual_projection = Linear(config.vision_config.hidden_size,
                                        config.projection_dim, False,
                                        kernel_init=normal_init(0.02), **kw)
        self.text_projection = Linear(config.text_config.hidden_size,
                                      config.projection_dim, False,
                                      kernel_init=normal_init(0.02), **kw)
        self.max_log_logit_scale = math.log(config.max_logit_scale)

    def init(self, rng):
        params = super().init(rng)
        params["logit_scale"] = jnp.asarray(self.config.logit_scale_init_value,
                                            self.param_dtype)
        return params

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, **kwargs) -> Aimv2Output:
        vision = self.vision_model(params["vision_model"],
                                   jnp.asarray(pixel_values, self.dtype))
        text = self.text_model(params["text_model"], input_ids, attention_mask)
        image_embeds = self.visual_projection(params["visual_projection"],
                                              vision.pooler_output)
        text_embeds = self.text_projection(params["text_projection"],
                                           text.pooler_output)
        image_embeds = image_embeds / jnp.linalg.norm(image_embeds, axis=-1,
                                                      keepdims=True)
        text_embeds = text_embeds / jnp.linalg.norm(text_embeds, axis=-1,
                                                    keepdims=True)
        scale = jnp.exp(jnp.clip(params["logit_scale"].astype(jnp.float32),
                                 0.0, self.max_log_logit_scale))
        logits_per_text = (scale * text_embeds) @ image_embeds.T
        return Aimv2Output(logits_per_image=logits_per_text.T,
                           logits_per_text=logits_per_text,
                           text_embeds=text_embeds, image_embeds=image_embeds,
                           text_model_output=text, vision_model_output=vision)
