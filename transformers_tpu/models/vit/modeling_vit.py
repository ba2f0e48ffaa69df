"""ViT, TPU-native (reference src/transformers/models/vit/modeling_vit.py:
patch embed :42, CLS+pos embed :72, encoder :257, classification head :403).

Pre-norm encoder over patch tokens. The patch projection is a conv in the
checkpoint; lowered here to one reshape + matmul (identical math for
stride == kernel) so the whole model is MXU matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, ImageClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from .configuration_vit import ViTConfig


class ViTPatchEmbeddings(Module):
    """Conv-as-matmul patch projection (reference modeling_vit.py:42)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.patch_size = config.patch_size
        self.num_channels = config.num_channels
        self.hidden_size = config.hidden_size
        self.initializer_range = config.initializer_range

    def init(self, rng):
        import jax

        kw, kb = jax.random.split(rng)
        p, c, h = self.patch_size, self.num_channels, self.hidden_size
        # Checkpoint layout: projection.weight [hidden, C, P, P] (torch conv OIHW)
        weight = normal_init(self.initializer_range)(kw, (h, c, p, p), self.param_dtype)
        return {"projection": {"weight": weight, "bias": jnp.zeros((h,), self.param_dtype)}}

    def __call__(self, params, pixel_values):  # [B, C, H, W]
        b, c, hh, ww = pixel_values.shape
        p = self.patch_size
        gh, gw = hh // p, ww // p
        # [B, C, gh, p, gw, p] -> [B, gh, gw, C, p, p] -> [B, N, C*p*p]
        x = pixel_values.reshape(b, c, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * p * p)
        w = params["projection"]["weight"].astype(self.dtype).reshape(self.hidden_size, -1)
        out = jnp.dot(x.astype(self.dtype), w.T) + params["projection"]["bias"].astype(self.dtype)
        return out  # [B, N, hidden]


class ViTEmbeddings(Module):
    """CLS token + learned position embeddings (reference modeling_vit.py:72)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_embeddings = ViTPatchEmbeddings(config, dtype=dtype, param_dtype=param_dtype)
        self.num_patches = (config.image_size // config.patch_size) ** 2

    def init(self, rng):
        import jax

        k1, k2, k3 = jax.random.split(rng, 3)
        params = {
            "cls_token": normal_init(self.config.initializer_range)(
                k1, (1, 1, self.config.hidden_size), self.param_dtype),
            "position_embeddings": normal_init(self.config.initializer_range)(
                k2, (1, self.num_patches + 1, self.config.hidden_size), self.param_dtype),
            "patch_embeddings": self.patch_embeddings.init(k3),
        }
        return params

    def __call__(self, params, pixel_values):
        patches = self.patch_embeddings(params["patch_embeddings"], pixel_values)
        b = patches.shape[0]
        cls = jnp.broadcast_to(params["cls_token"].astype(self.dtype), (b, 1, patches.shape[-1]))
        x = jnp.concatenate([cls, patches], axis=1)
        return x + params["position_embeddings"].astype(self.dtype)


class ViTSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.query = Linear(config.hidden_size, config.hidden_size, config.qkv_bias, **kw)
        self.key = Linear(config.hidden_size, config.hidden_size, config.qkv_bias, **kw)
        self.value = Linear(config.hidden_size, config.hidden_size, config.qkv_bias, **kw)

    def __call__(self, params, hidden, probs_sink=None):
        b, s, e = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.head_dim**-0.5, is_causal=False, probs_sink=probs_sink)
        return out.reshape(b, s, e)


class ViTAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.attention = ViTSelfAttention(config, dtype=dtype, param_dtype=param_dtype)
        self.output = _ViTSelfOutput(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, probs_sink=None):
        return self.output(params["output"],
                           self.attention(params["attention"], hidden, probs_sink))


class _ViTSelfOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True, dtype=dtype,
                            param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden):
        return self.dense(params["dense"], hidden)


class ViTIntermediate(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.intermediate_size, True, dtype=dtype,
                            param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.act(self.dense(params["dense"], x))


class ViTOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.intermediate_size, config.hidden_size, True, dtype=dtype,
                            param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden, residual):
        return self.dense(params["dense"], hidden) + residual


class ViTLayer(Module):
    """Pre-norm block (reference modeling_vit.py ViTLayer)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = ViTAttention(config, **kw)
        self.intermediate = ViTIntermediate(config, **kw)
        self.output = ViTOutput(config, **kw)
        self.layernorm_before = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.layernorm_after = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, probs_sink=None):
        h = self.attention(params["attention"],
                           self.layernorm_before(params["layernorm_before"], hidden), probs_sink)
        hidden = hidden + h
        h = self.intermediate(params["intermediate"], self.layernorm_after(params["layernorm_after"], hidden))
        return self.output(params["output"], h, hidden)


class ViTEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [ViTLayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, output_hidden_states=False, probs_sink=None):
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layer):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["layer"][str(i)], hidden, probs_sink)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class ViTPooler(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.pooler_output_size, True, dtype=dtype,
                            param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.act = get_activation(config.pooler_act)

    def __call__(self, params, hidden):
        return self.act(self.dense(params["dense"], hidden[:, 0]))


class ViTModel(Module):
    def __init__(self, config: ViTConfig, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = ViTEmbeddings(config, **kw)
        self.encoder = ViTEncoder(config, **kw)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.pooler = ViTPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, pixel_values, output_hidden_states=False,
                 output_attentions=False) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], pixel_values)
        probs_sink = [] if output_attentions else None
        hidden, all_hidden = self.encoder(params["encoder"], hidden, output_hidden_states, probs_sink)
        hidden = self.layernorm(params["layernorm"], hidden)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
            attentions=tuple(probs_sink) if probs_sink is not None else None,
        )


class ViTPreTrainedModel(PreTrainedModel):
    config_class = ViTConfig
    base_model_prefix = "vit"
    main_input_name = "pixel_values"


class ViTModelStandalone(ViTPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.vit = ViTModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.vit(params["vit"], pixel_values, **kwargs)


class ViTForImageClassification(ViTPreTrainedModel):
    """reference modeling_vit.py:403 (classifier on the CLS token)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.num_labels = config.num_labels
        self.vit = ViTModel(config, dtype=self.dtype, param_dtype=self.param_dtype, add_pooling_layer=False)
        self.classifier = Linear(config.hidden_size, config.num_labels, True, dtype=self.dtype,
                                 param_dtype=self.param_dtype, kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values, labels=None, output_hidden_states=False, **kwargs) -> ImageClassifierOutput:
        outputs = self.vit(params["vit"], pixel_values, output_hidden_states)
        logits = self.classifier(params["classifier"], outputs.last_hidden_state[:, 0])
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ImageClassifierOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)
