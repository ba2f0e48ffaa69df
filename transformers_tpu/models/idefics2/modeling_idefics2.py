"""Idefics2 (reference models/idefics2/modeling_idefics2.py).

SigLIP-NaViT vision (shared with Idefics3) + gated modality-projection MLP +
**perceiver resampler** connector (:546): ``resampler_depth`` cross-attention
blocks where fixed learned latents (ones-init, :713) attend over
[context; latents] with GQA and RMS pre-norms, compressing each image to
``resampler_n_latents`` tokens, then a Mistral decoder.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Linear, Module, RMSNorm, normal_init
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from ..idefics3.modeling_idefics3 import (Idefics3ForConditionalGeneration,
                                          Idefics3Model,
                                          Idefics3VisionTransformer)
from .configuration_idefics2 import Idefics2Config, Idefics2PerceiverConfig


class Idefics2MLP(Module):
    def __init__(self, hidden_size, intermediate_size, output_size, hidden_act,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.gate_proj = Linear(hidden_size, intermediate_size, False, **kw)
        self.up_proj = Linear(hidden_size, intermediate_size, False, **kw)
        self.down_proj = Linear(intermediate_size, output_size, False, **kw)
        self.act = get_activation(hidden_act)

    def __call__(self, params, x):
        return self.down_proj(params["down_proj"],
                              self.act(self.gate_proj(params["gate_proj"], x))
                              * self.up_proj(params["up_proj"], x))


class Idefics2PerceiverAttention(Module):
    """GQA cross-attention: queries from latents, k/v over [context; latents]
    (reference :546)."""

    def __init__(self, config: Idefics2PerceiverConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.resampler_n_heads
        self.head_dim = config.resampler_head_dim
        self.num_kv_heads = config.num_key_value_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        h = config.hidden_size
        self.q_proj = Linear(h, self.num_heads * self.head_dim, False, **kw)
        self.k_proj = Linear(h, self.num_kv_heads * self.head_dim, False, **kw)
        self.v_proj = Linear(h, self.num_kv_heads * self.head_dim, False, **kw)
        self.o_proj = Linear(self.num_heads * self.head_dim, h, False, **kw)

    def __call__(self, params, latents, context, kv_valid=None):
        b, q_len, _ = latents.shape
        hidden = jnp.concatenate([context, latents], axis=1)
        kv_len = hidden.shape[1]
        q = self.q_proj(params["q_proj"], latents).reshape(b, q_len, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, kv_len, self.num_kv_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, kv_len, self.num_kv_heads, self.head_dim)
        kwargs = {"is_causal": False}
        if kv_valid is not None:
            kwargs["kv_valid"] = kv_valid
        out = eager_attention(q, k, v, scale=self.head_dim**-0.5, **kwargs)
        return self.o_proj(params["o_proj"], out.reshape(b, q_len, -1))


class Idefics2PerceiverLayer(Module):
    def __init__(self, config: Idefics2PerceiverConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.input_latents_norm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.input_context_norm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.self_attn = Idefics2PerceiverAttention(config, **kw)
        self.post_attention_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.mlp = Idefics2MLP(config.hidden_size, config.hidden_size * 4,
                               config.hidden_size, config.hidden_act, **kw)

    def __call__(self, params, latents, context, kv_valid=None):
        residual = latents
        lat = self.input_latents_norm(params["input_latents_norm"], latents)
        ctx = self.input_context_norm(params["input_context_norm"], context)
        latents = residual + self.self_attn(params["self_attn"], lat, ctx, kv_valid)
        residual = latents
        latents = self.post_attention_layernorm(params["post_attention_layernorm"], latents)
        return residual + self.mlp(params["mlp"], latents)


class Idefics2PerceiverResampler(Module):
    def __init__(self, config: Idefics2PerceiverConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.n_latents = config.resampler_n_latents
        self.hidden_size = config.hidden_size
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layers = [Idefics2PerceiverLayer(config, **kw)
                       for _ in range(config.resampler_depth)]
        self.norm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["latents"] = jnp.ones((self.n_latents, self.hidden_size), self.param_dtype)
        return params

    def __call__(self, params, context, context_valid=None):
        b = context.shape[0]
        latents = jnp.broadcast_to(params["latents"].astype(self.dtype),
                                   (b, self.n_latents, self.hidden_size))
        kv_valid = None
        if context_valid is not None:
            kv_valid = jnp.concatenate(
                [context_valid.astype(jnp.int32),
                 jnp.ones((b, self.n_latents), jnp.int32)], axis=1)
        for i, layer in enumerate(self.layers):
            latents = layer(params["layers"][str(i)], latents, context, kv_valid)
        return self.norm(params["norm"], latents)


class Idefics2Connector(Module):
    def __init__(self, config: Idefics2Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.modality_projection = Idefics2MLP(
            config.vision_config.hidden_size, config.text_config.intermediate_size,
            config.text_config.hidden_size, config.text_config.hidden_act, **kw)
        self.perceiver_resampler = Idefics2PerceiverResampler(config.perceiver_config, **kw)

    def __call__(self, params, image_hidden_states, context_valid=None):
        h = self.modality_projection(params["modality_projection"], image_hidden_states)
        return self.perceiver_resampler(params["perceiver_resampler"], h, context_valid)


class Idefics2Model(Idefics3Model):
    def __init__(self, config: Idefics2Config, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.vision_model = Idefics3VisionTransformer(config.vision_config, **kw)
        self.connector = Idefics2Connector(config, **kw)
        from ..llava.modeling_llava import _language_model_cls

        lm = _language_model_cls(config.text_config.model_type)(config.text_config, **kw)
        self.text_model = lm.model

    def get_image_features(self, params, pixel_values, pixel_attention_mask=None):
        b, n = pixel_values.shape[:2]
        pv = pixel_values.reshape((b * n,) + pixel_values.shape[2:])
        patch_mask = None
        ctx_valid = None
        if pixel_attention_mask is not None:
            pm = pixel_attention_mask.reshape((b * n,) + pixel_attention_mask.shape[2:])
            p = self.config.vision_config.patch_size
            gh, gw = pm.shape[1] // p, pm.shape[2] // p
            pm = pm[:, : gh * p, : gw * p].reshape(b * n, gh, p, gw, p)
            patch_mask = pm.sum(axis=(2, 4)) > 0
            ctx_valid = patch_mask.reshape(b * n, -1)
        out = self.vision_model(params["vision_model"], pv, patch_mask)
        return self.connector(params["connector"], out.last_hidden_state, ctx_valid)


class Idefics2ForConditionalGeneration(Idefics3ForConditionalGeneration):
    config_class = Idefics2Config
    model_cls = Idefics2Model
