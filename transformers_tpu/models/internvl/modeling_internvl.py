"""InternVL (reference models/internvl/modeling_internvl.py).

Vision: BEiT-style ViT with CLS token, absolute position embeddings,
layer-scale (lambda_1/lambda_2, :330), optional whole-vector q/k RMSNorm
(:120), LayerNorm-or-RMSNorm blocks. Features are 0.5-pixel-shuffled
(:688) and projected through LayerNorm + 2-layer MLP (:484), then scattered
into a Qwen2/Llama decoder at image-token positions.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import (Embedding, LayerNorm, Linear, Module, RMSNorm,
                            normal_init)
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from ..llava.modeling_llava import (LlavaForConditionalGeneration, LlavaModel,
                                    LlavaPreTrainedModel, _language_model_cls)
from .configuration_internvl import InternVLConfig, InternVLVisionConfig


def _norm_cls(norm_type):
    return LayerNorm if norm_type == "layer_norm" else RMSNorm


class InternVLVisionAttention(Module):
    """Whole-embedding q/k RMSNorm BEFORE head split (reference :120)."""

    def __init__(self, config: InternVLVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        e = config.hidden_size
        self.q_proj = Linear(e, e, config.attention_bias, **kw)
        self.k_proj = Linear(e, e, config.attention_bias, **kw)
        self.v_proj = Linear(e, e, config.attention_bias, **kw)
        self.projection_layer = Linear(e, e, True, **kw)
        self.use_qk_norm = config.use_qk_norm
        if config.use_qk_norm:
            self.q_norm = RMSNorm(e, 1e-6, dtype=dtype, param_dtype=param_dtype)
            self.k_norm = RMSNorm(e, 1e-6, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden):
        b, s, e = hidden.shape
        q = self.q_proj(params["q_proj"], hidden)
        k = self.k_proj(params["k_proj"], hidden)
        v = self.v_proj(params["v_proj"], hidden)
        if self.use_qk_norm:
            q = self.q_norm(params["q_norm"], q)
            k = self.k_norm(params["k_norm"], k)
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, s, self.num_heads, self.head_dim)
        v = v.reshape(b, s, self.num_heads, self.head_dim)
        out = eager_attention(q, k, v, is_causal=False, scale=self.head_dim**-0.5)
        return self.projection_layer(params["projection_layer"], out.reshape(b, s, e))


class InternVLVisionMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.fc1 = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class InternVLVisionLayer(Module):
    """Pre/post norms + layer-scale lambdas (reference :330)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        norm = _norm_cls(config.norm_type)
        self.attention = InternVLVisionAttention(config, **kw)
        self.layernorm_before = norm(config.hidden_size, config.layer_norm_eps, **kw)
        self.layernorm_after = norm(config.hidden_size, config.layer_norm_eps, **kw)
        self.mlp = InternVLVisionMLP(config, **kw)
        self.hidden_size = config.hidden_size
        self.init_value = config.layer_scale_init_value

    def init(self, rng):
        params = super().init(rng)
        params["lambda_1"] = jnp.full((self.hidden_size,), self.init_value, self.param_dtype)
        params["lambda_2"] = jnp.full((self.hidden_size,), self.init_value, self.param_dtype)
        return params

    def __call__(self, params, hidden):
        att = self.attention(params["attention"],
                             self.layernorm_before(params["layernorm_before"], hidden))
        hidden = params["lambda_1"].astype(self.dtype) * att + hidden
        h = self.layernorm_after(params["layernorm_after"], hidden)
        h = self.mlp(params["mlp"], h)
        return params["lambda_2"].astype(self.dtype) * h + hidden


class InternVLVisionEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [InternVLVisionLayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]


class InternVLVisionModel(Module):
    """reference :427 — embeddings(CLS + patch + abs pos) → layers → norm."""

    def __init__(self, config: InternVLVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.encoder = InternVLVisionEncoder(config, **kw)
        if not config.use_mean_pooling:
            self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        ih, iw = config.image_size
        ph, pw = config.patch_size
        self.grid = (ih // ph, iw // pw)
        self.num_patches = self.grid[0] * self.grid[1]

    def init(self, rng):
        import jax

        params = super().init(rng)
        c = self.config
        k1, k2, k3 = jax.random.split(rng, 3)
        emb = {"cls_token": jnp.zeros((1, 1, c.hidden_size), self.param_dtype),
               "patch_embeddings": {"projection": {
                   "weight": normal_init(c.initializer_range)(
                       k1, (c.hidden_size, c.num_channels, c.patch_size[0], c.patch_size[1]),
                       self.param_dtype),
                   "bias": jnp.zeros((c.hidden_size,), self.param_dtype)}}}
        if c.use_absolute_position_embeddings:
            emb["position_embeddings"] = jnp.zeros(
                (1, self.num_patches + 1, c.hidden_size), self.param_dtype)
        if c.use_mask_token:
            emb["mask_token"] = jnp.zeros((1, 1, c.hidden_size), self.param_dtype)
        params["embeddings"] = emb
        return params

    def __call__(self, params, pixel_values, output_hidden_states=False):
        c = self.config
        emb = params["embeddings"]
        w = emb["patch_embeddings"]["projection"]["weight"].astype(self.dtype)
        b_, ch, hh, ww = pixel_values.shape
        ph, pw = c.patch_size
        x = pixel_values.astype(self.dtype).reshape(b_, ch, hh // ph, ph, ww // pw, pw)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b_, -1, ch * ph * pw)
        x = x @ w.reshape(w.shape[0], -1).T + emb["patch_embeddings"]["projection"]["bias"].astype(self.dtype)
        cls = jnp.broadcast_to(emb["cls_token"].astype(self.dtype), (b_, 1, x.shape[-1]))
        hidden = jnp.concatenate([cls, x], axis=1)
        if c.use_absolute_position_embeddings:
            hidden = hidden + emb["position_embeddings"].astype(self.dtype)
        states = [hidden] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layer):
            hidden = layer(params["encoder"]["layer"][str(i)], hidden)
            if output_hidden_states:
                states.append(hidden)
        last = hidden
        if not c.use_mean_pooling:
            last = self.layernorm(params["layernorm"], last)
        from ...modeling_outputs import BaseModelOutputWithPooling

        return BaseModelOutputWithPooling(last_hidden_state=last,
                                          hidden_states=tuple(states) if states else None)


class InternVLMultiModalProjector(Module):
    def __init__(self, config: InternVLConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        in_dim = config.vision_config.hidden_size * int(1 / config.downsample_ratio) ** 2
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.layer_norm = LayerNorm(in_dim, 1e-5, dtype=dtype, param_dtype=param_dtype)
        self.linear_1 = Linear(in_dim, config.text_config.hidden_size, True, **kw)
        self.linear_2 = Linear(config.text_config.hidden_size,
                               config.text_config.hidden_size, True, **kw)
        self.act = get_activation(config.projector_hidden_act)

    def __call__(self, params, x):
        h = self.layer_norm(params["layer_norm"], x)
        h = self.act(self.linear_1(params["linear_1"], h))
        return self.linear_2(params["linear_2"], h)


class InternVLModel(LlavaModel):
    projector_cls = InternVLMultiModalProjector

    def __init__(self, config: InternVLConfig, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.vision_tower = InternVLVisionModel(config.vision_config, **kw)
        self.multi_modal_projector = InternVLMultiModalProjector(config, **kw)
        self.language_model = _language_model_cls(config.text_config.model_type)(
            config.text_config, **kw).model

    def _pixel_shuffle(self, feats, scale):
        """reference :688 — operates on [B, W, H, C]."""
        b, w, h, c = feats.shape
        feats = feats.reshape(b, w, int(h * scale), int(c / scale))
        feats = feats.transpose(0, 2, 1, 3)
        feats = feats.reshape(b, int(h * scale), int(w * scale), int(c / scale**2))
        return feats.transpose(0, 2, 1, 3)

    def get_image_features(self, params, pixel_values, vision_feature_layer=None,
                           vision_feature_select_strategy=None):
        layer = vision_feature_layer if vision_feature_layer is not None \
            else self.config.vision_feature_layer
        strategy = vision_feature_select_strategy or self.config.vision_feature_select_strategy
        if layer == -1:
            feats = self.vision_tower(params["vision_tower"], pixel_values).last_hidden_state
        else:
            feats = self.vision_tower(params["vision_tower"], pixel_values,
                                      output_hidden_states=True).hidden_states[layer]
        if strategy == "default":
            feats = feats[:, 1:, :]
        b, s, _ = feats.shape
        side = int(s ** 0.5)
        feats = feats.reshape(b, side, side, -1)
        feats = self._pixel_shuffle(feats, self.config.downsample_ratio)
        feats = feats.reshape(b, -1, feats.shape[-1])
        return self.multi_modal_projector(params["multi_modal_projector"], feats)


class InternVLPreTrainedModel(LlavaPreTrainedModel):
    config_class = InternVLConfig


class InternVLForConditionalGeneration(LlavaForConditionalGeneration):
    config_class = InternVLConfig
    model_cls = InternVLModel
