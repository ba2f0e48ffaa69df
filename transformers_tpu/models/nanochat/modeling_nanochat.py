"""NanoChat (reference src/transformers/models/nanochat/modular_nanochat.py).

Llama skeleton with: weightless L2 RMS norms everywhere, a SIGN-FLIPPED
rotate_half ((x2, -x1) instead of (-x2, x1), reference :52), rope applied
BEFORE the q/k norms (:85), a relu^2 fc1/fc2 MLP (:112), an extra weightless
norm before the first layer (:181), and Gemma2-style logit softcapping."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module
from ...modeling_layers import (
    GenericForQuestionAnswering,
    GenericForSequenceClassification,
    GenericForTokenClassification,
)
from ...ops.activations import get_activation
from ..llama.modeling_llama import (
    DECODER_TP_PLAN,
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_nanochat import NanoChatConfig


class NanoChatRMSNorm(Module):
    """Weightless x / rms(x) (reference Llama4TextL2Norm)."""

    def __init__(self, eps=1e-6, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.eps = eps

    def init(self, rng):
        return {}

    def __call__(self, params, x):
        f = x.astype(jnp.float32)
        return (f * jax.lax.rsqrt(jnp.mean(f * f, -1, keepdims=True)
                                  + self.eps)).astype(x.dtype)


def _nanochat_rope(q, k, cos, sin):
    """rotate_half with flipped signs: (x1, x2) -> (x2, -x1) (reference :52)."""
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)

    def rot_half(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([x2, -x1], axis=-1)

    def rot(x):
        h = x.astype(jnp.float32)
        return ((h * cos) + (rot_half(h) * sin)).astype(x.dtype)

    return rot(q), rot(k)


class NanoChatMLP(Module):
    """fc1 -> relu^2 -> fc2, both bias-free (reference :112)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.fc1 = Linear(config.hidden_size, config.intermediate_size,
                          use_bias=False, **kw)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size,
                          use_bias=False, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class NanoChatAttention(LlamaAttention):
    rope_fn = staticmethod(_nanochat_rope)

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        # rope applies BEFORE the q/k norms (reference :85), so the weightless
        # norms live outside the skeleton's pre-rope q_norm/k_norm hooks
        norm = NanoChatRMSNorm(config.rms_norm_eps, dtype=dtype, param_dtype=param_dtype)
        object.__setattr__(self, "_l2norm", norm)

    def post_rope_qk(self, params, q, k):
        return self._l2norm({}, q), self._l2norm({}, k)


class NanoChatDecoderLayer(LlamaDecoderLayer):
    attention_cls = NanoChatAttention
    mlp_cls = NanoChatMLP

    @staticmethod
    def make_norm(config, **kw):
        return NanoChatRMSNorm(config.rms_norm_eps, **kw)


class NanoChatModel(LlamaModel):
    decoder_layer_cls = NanoChatDecoderLayer

    def embed(self, params, input_ids):
        h = super().embed(params, input_ids)
        # extra weightless norm before the first layer (reference :181); the
        # same (param-free) final norm module re-runs after the stack
        return self.norm(params["norm"], h)


class NanoChatForCausalLM(LlamaForCausalLM):
    config_class = NanoChatConfig
    model_cls = NanoChatModel
    _tp_plan = DECODER_TP_PLAN


class NanoChatModelStandalone(LlamaModelStandalone):
    config_class = NanoChatConfig
    model_cls = NanoChatModel


class NanoChatForSequenceClassification(GenericForSequenceClassification):
    config_class = NanoChatConfig
    model_cls = NanoChatModel


class NanoChatForTokenClassification(GenericForTokenClassification):
    config_class = NanoChatConfig
    model_cls = NanoChatModel


class NanoChatForQuestionAnswering(GenericForQuestionAnswering):
    config_class = NanoChatConfig
    model_cls = NanoChatModel
