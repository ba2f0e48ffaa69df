"""Switch Transformers, TPU-native (reference
src/transformers/models/switch_transformers/modeling_switch_transformers.py).

T5 skeleton where every ``sparse_step``-th FF layer is a top-1 Switch MoE
(``SwitchTransformersSparseMLP``): a float32 router softmax picks one expert
per token (argmax), tokens beyond ``expert_capacity`` per expert (cumsum
priority over the sequence) are dropped to zero, and the chosen expert's
output is scaled by the top router probability. Checkpoint layout
``block.N.layer.L.mlp.{router.classifier,experts.expert_E.{wi,wo},wi,wo}``.

TPU-native: experts run as one stacked batched einsum combined by the
one-hot dispatch mask — no gather/scatter, MXU-shaped (ops/moe.py rationale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, RMSNorm, normal_init
from ...ops.activations import get_activation
from ..t5.modeling_t5 import (
    T5Block,
    T5DenseActDense,
    T5EncoderModel,
    T5ForConditionalGeneration,
    T5LayerCrossAttention,
    T5LayerSelfAttention,
    T5Stack,
)
from .configuration_switch_transformers import SwitchTransformersConfig


class SwitchTransformersTop1Router(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.classifier = Linear(config.d_model, config.num_experts, config.router_bias,
                                 dtype=dtype, param_dtype=param_dtype,
                                 kernel_init=normal_init(config.initializer_range))


class _SwitchExperts(Module):
    """Container with ``expert_N`` child names (checkpoint layout)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        for e in range(config.num_experts):
            setattr(self, f"expert_{e}",
                    T5DenseActDense(config, dtype=dtype, param_dtype=param_dtype))


class SwitchTransformersSparseMLP(Module):
    """Top-1 MoE (reference SwitchTransformersSparseMLP + Top1Router)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_experts = config.num_experts
        self.expert_capacity = config.expert_capacity
        self.router = SwitchTransformersTop1Router(config, dtype=dtype, param_dtype=param_dtype)
        self.experts = _SwitchExperts(config, dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.dense_act_fn)

    def __call__(self, params, x):
        b, s, h = x.shape
        logits = self.router.classifier(params["router"]["classifier"],
                                        x.astype(jnp.float32))          # [B,S,E]
        probs = jax.nn.softmax(logits, axis=-1)
        idx = jnp.argmax(probs, axis=-1)                                # [B,S]
        one_hot = jax.nn.one_hot(idx, self.num_experts, dtype=jnp.float32)
        # capacity: priority = per-sequence cumulative count per expert
        priority = jnp.cumsum(one_hot, axis=1)
        one_hot = one_hot * (priority <= self.expert_capacity)
        top_prob = jnp.max(probs, axis=-1, keepdims=True)               # [B,S,1]

        # all experts on all tokens, combined by the dispatch mask (dense
        # batched-mm — see ops/moe.py for why this wins on the MXU at small E)
        wi = jnp.stack([params["experts"][f"expert_{e}"]["wi"]["weight"]
                        for e in range(self.num_experts)])              # [E,H,F]
        wo = jnp.stack([params["experts"][f"expert_{e}"]["wo"]["weight"]
                        for e in range(self.num_experts)])              # [E,F,H]
        xt = x.reshape(b * s, h).astype(self.dtype)
        inner = self.act(jnp.einsum("th,ehf->etf", xt, wi.astype(self.dtype)))
        outs = jnp.einsum("etf,efh->eth", inner, wo.astype(self.dtype))  # [E,T,H]
        combine = one_hot.reshape(b * s, self.num_experts)               # [T,E]
        mixed = jnp.einsum("te,eth->th", combine.astype(outs.dtype), outs)
        out = mixed.reshape(b, s, h) * top_prob.astype(outs.dtype)
        return out


class SwitchTransformersLayerFF(Module):
    """FF wrapper named ``mlp`` (reference SwitchTransformersLayerFF)."""

    def __init__(self, config, is_sparse, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        if is_sparse:
            self.mlp = SwitchTransformersSparseMLP(config, **kw)
        else:
            self.mlp = T5DenseActDense(config, **kw)
        self.layer_norm = RMSNorm(config.d_model, config.layer_norm_epsilon, **kw)

    def __call__(self, params, hidden):
        h = self.mlp(params["mlp"], self.layer_norm(params["layer_norm"], hidden))
        return hidden + h


class SwitchTransformersBlock(T5Block):
    def __init__(self, config, has_bias, is_decoder, is_sparse, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        sublayers = [T5LayerSelfAttention(config, has_bias, **kw)]
        if is_decoder:
            sublayers.append(T5LayerCrossAttention(config, **kw))
        sublayers.append(SwitchTransformersLayerFF(config, is_sparse, **kw))
        self.layer = sublayers
        self.is_decoder = is_decoder


class SwitchTransformersStack(T5Stack):
    def make_block(self, config, i, num_layers, kw):
        step = (config.decoder_sparse_step if self.is_decoder
                else config.encoder_sparse_step)
        is_sparse = (i % step == 1 or step == 1) if step > 0 else False
        return SwitchTransformersBlock(config, has_bias=(i == 0),
                                       is_decoder=self.is_decoder,
                                       is_sparse=is_sparse, **kw)


class SwitchTransformersForConditionalGeneration(T5ForConditionalGeneration):
    config_class = SwitchTransformersConfig
    stack_cls = SwitchTransformersStack


class SwitchTransformersEncoderModel(T5EncoderModel):
    config_class = SwitchTransformersConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.encoder = SwitchTransformersStack(config, False, config.num_layers,
                                               dtype=self.dtype, param_dtype=self.param_dtype)
