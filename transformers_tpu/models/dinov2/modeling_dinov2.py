"""DINOv2 (reference src/transformers/models/dinov2/modeling_dinov2.py).

ViT-style encoder with per-block LayerScale (lambda1, :272-278), optional
SwiGLU FFN (:300-314, hidden width rounded to a multiple of 8 after the 2/3
shrink), a mask token in the embeddings (:47), norm names ``norm1``/``norm2``,
and a classification head over [CLS ‖ mean(patch tokens)] (:486-495).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, ImageClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ..vit.modeling_vit import ViTPatchEmbeddings
from .configuration_dinov2 import Dinov2Config


class Dinov2Embeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_embeddings = ViTPatchEmbeddings(config, dtype=dtype, param_dtype=param_dtype)
        self.num_patches = (config.image_size // config.patch_size) ** 2

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        init = normal_init(self.config.initializer_range)
        h = self.config.hidden_size
        params = {
            "cls_token": init(k1, (1, 1, h), self.param_dtype),
            "position_embeddings": init(k2, (1, self.num_patches + 1, h), self.param_dtype),
            "patch_embeddings": self.patch_embeddings.init(k3),
        }
        if self.config.use_mask_token:
            params["mask_token"] = jnp.zeros((1, h), self.param_dtype)
        return params

    def __call__(self, params, pixel_values, bool_masked_pos=None):
        patches = self.patch_embeddings(params["patch_embeddings"], pixel_values)
        b = patches.shape[0]
        if bool_masked_pos is not None and self.config.use_mask_token:
            mask_tok = params["mask_token"].astype(patches.dtype)[None]  # [1, 1, h]
            patches = jnp.where(bool_masked_pos[..., None], mask_tok, patches)
        cls = jnp.broadcast_to(params["cls_token"].astype(self.dtype), (b, 1, patches.shape[-1]))
        x = jnp.concatenate([cls, patches], axis=1)
        return x + params["position_embeddings"].astype(self.dtype)


class Dinov2SelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
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


class Dinov2Attention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = Dinov2SelfAttention(config, **kw)
        self.output = _Dinov2SelfOutput(config, **kw)

    def __call__(self, params, hidden, probs_sink=None):
        return self.output(params["output"],
                           self.attention(params["attention"], hidden, probs_sink))


class _Dinov2SelfOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True, dtype=dtype,
                            param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden):
        return self.dense(params["dense"], hidden)


class Dinov2MLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        inner = int(config.hidden_size * config.mlp_ratio)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.fc1 = Linear(config.hidden_size, inner, True, **kw)
        self.fc2 = Linear(inner, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class Dinov2SwiGLUFFN(Module):
    """reference :300-314 (2/3 shrink rounded up to a multiple of 8)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        inner = int(config.hidden_size * config.mlp_ratio)
        inner = (int(inner * 2 / 3) + 7) // 8 * 8
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.weights_in = Linear(config.hidden_size, 2 * inner, True, **kw)
        self.weights_out = Linear(inner, config.hidden_size, True, **kw)

    def __call__(self, params, x):
        h = self.weights_in(params["weights_in"], x)
        x1, x2 = jnp.split(h, 2, axis=-1)
        return self.weights_out(params["weights_out"], jax.nn.silu(x1) * x2)


class Dinov2LayerScale(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dim = config.hidden_size
        self.value = config.layerscale_value

    def init(self, rng):
        return {"lambda1": jnp.full((self.dim,), self.value, self.param_dtype)}

    def __call__(self, params, x):
        return x * params["lambda1"].astype(x.dtype)


class Dinov2Layer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm1 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.attention = Dinov2Attention(config, **kw)
        self.layer_scale1 = Dinov2LayerScale(config, **kw)
        self.norm2 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.mlp = (Dinov2SwiGLUFFN(config, **kw) if config.use_swiglu_ffn
                    else Dinov2MLP(config, **kw))
        self.layer_scale2 = Dinov2LayerScale(config, **kw)

    def __call__(self, params, hidden, probs_sink=None):
        h = self.attention(params["attention"], self.norm1(params["norm1"], hidden), probs_sink)
        hidden = hidden + self.layer_scale1(params["layer_scale1"], h)
        h = self.mlp(params["mlp"], self.norm2(params["norm2"], hidden))
        return hidden + self.layer_scale2(params["layer_scale2"], h)


class Dinov2Encoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [Dinov2Layer(config, dtype=dtype, param_dtype=param_dtype)
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


class Dinov2Model(Module):
    def __init__(self, config: Dinov2Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = Dinov2Embeddings(config, **kw)
        self.encoder = Dinov2Encoder(config, **kw)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values, bool_masked_pos=None,
                 output_hidden_states=False, output_attentions=False) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], pixel_values, bool_masked_pos)
        probs_sink = [] if output_attentions else None
        hidden, all_hidden = self.encoder(params["encoder"], hidden, output_hidden_states, probs_sink)
        hidden = self.layernorm(params["layernorm"], hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=hidden[:, 0],
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
            attentions=tuple(probs_sink) if probs_sink is not None else None,
        )


class Dinov2PreTrainedModel(PreTrainedModel):
    config_class = Dinov2Config
    base_model_prefix = "dinov2"
    main_input_name = "pixel_values"


class Dinov2ModelStandalone(Dinov2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.dinov2 = Dinov2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.dinov2(params["dinov2"], pixel_values, **kwargs)


class Dinov2ForImageClassification(Dinov2PreTrainedModel):
    """classifier over [CLS ‖ mean(patch tokens)] (reference :486-495)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.num_labels = config.num_labels
        self.dinov2 = Dinov2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_size * 2, config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values, labels=None, output_hidden_states=False,
                 **kwargs) -> ImageClassifierOutput:
        outputs = self.dinov2(params["dinov2"], pixel_values,
                              output_hidden_states=output_hidden_states)
        seq = outputs.last_hidden_state
        feats = jnp.concatenate([seq[:, 0], jnp.mean(seq[:, 1:], axis=1)], axis=-1)
        logits = self.classifier(params["classifier"], feats)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ImageClassifierOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)
