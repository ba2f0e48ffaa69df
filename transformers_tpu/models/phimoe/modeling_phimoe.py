"""Phi-3.5-MoE (reference src/transformers/models/phimoe/modeling_phimoe.py).

Mixtral checkpoint layout (``block_sparse_moe.experts.E.w{1,2,3}``, router
``gate``) with LayerNorm (biased) norms, bias-free GQA attention, LongRoPE
scaling, and the **sparsemixer** top-2 router: per-pick thresholded masking
(2·jitter_eps relative gap), softmax multiplier at the argmax pick, second
pick after scattering −inf at the first (:sparsemixer, eval path)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import LayerNorm, Linear, Module, normal_init
from ...ops.activations import get_activation
from ...ops.moe import get_experts_fn
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from ..mixtral.modeling_mixtral import MixtralExpertMLP


class PhimoeConfig(PretrainedConfig):
    model_type = "phimoe"

    def __init__(self, vocab_size=32064, hidden_size=4096, intermediate_size=6400,
                 num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
                 hidden_act="silu", max_position_embeddings=131072,
                 initializer_range=0.02, rms_norm_eps=1e-5, use_cache=True,
                 pad_token_id=None, bos_token_id=1, eos_token_id=2,
                 tie_word_embeddings=False, rope_theta=1e6, rope_scaling=None,
                 sliding_window=None, attention_dropout=0.0, num_experts_per_tok=2,
                 num_local_experts=16, output_router_logits=False,
                 router_aux_loss_coef=0.001, router_jitter_noise=0.01,
                 input_jitter_noise=0.0, attention_bias=False, lm_head_bias=False,
                 **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
        self.sliding_window = sliding_window
        self.attention_dropout = attention_dropout
        self.num_experts_per_tok = num_experts_per_tok
        self.num_local_experts = num_local_experts
        self.output_router_logits = output_router_logits
        self.router_aux_loss_coef = router_aux_loss_coef
        self.router_jitter_noise = router_jitter_noise
        self.input_jitter_noise = input_jitter_noise
        self.attention_bias = attention_bias
        self.lm_head_bias = lm_head_bias
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, tie_word_embeddings=tie_word_embeddings,
                         **kwargs)


def sparsemixer_route(logits, jitter_eps):
    """Eval-path sparsemixer (reference :sparsemixer): returns
    (weights [T,2], idx [T,2])."""
    logits = logits.astype(jnp.float32)

    def pick(scores, raw):
        m = jnp.max(scores, axis=-1, keepdims=True)
        factor = jnp.maximum(jnp.abs(raw), m)
        drop = ((m - raw) / factor) > (2 * jitter_eps)
        gates = jnp.where(drop, -jnp.inf, scores)
        sel = jnp.argmax(scores, axis=-1)
        probs = jax.nn.softmax(gates, axis=-1)
        w = jnp.take_along_axis(probs, sel[:, None], axis=-1)[:, 0]
        return w, sel

    w1, s1 = pick(logits, logits)
    masked = logits.at[jnp.arange(logits.shape[0]), s1].set(-jnp.inf)
    w2, s2 = pick(masked, logits)
    return jnp.stack([w1, w2], axis=-1), jnp.stack([s1, s2], axis=-1)


class PhimoeSparseMoeBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_experts = config.num_local_experts
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.gate = Linear(config.hidden_size, config.num_local_experts, False, **kw)
        self.experts = [MixtralExpertMLP(config, dtype=dtype, param_dtype=param_dtype)
                        for _ in range(config.num_local_experts)]
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(b * s, h)
        logits = self.gate(params["gate"], x)
        weights, idx = sparsemixer_route(logits, self.config.router_jitter_noise)
        w1 = jnp.stack([params["experts"][str(e)]["w1"]["weight"]
                        for e in range(self.num_experts)])
        w2 = jnp.stack([params["experts"][str(e)]["w2"]["weight"]
                        for e in range(self.num_experts)])
        w3 = jnp.stack([params["experts"][str(e)]["w3"]["weight"]
                        for e in range(self.num_experts)])
        experts_fn = get_experts_fn(getattr(self.config, "experts_implementation", None))
        out = experts_fn(x.astype(self.dtype), w1.astype(self.dtype),
                         w3.astype(self.dtype), w2.astype(self.dtype),
                         weights, idx, self.act)
        return out.reshape(b, s, h).astype(hidden.dtype)


class PhimoeAttention(LlamaAttention):
    pass


class PhimoeDecoderLayer(LlamaDecoderLayer):
    attention_cls = PhimoeAttention

    @staticmethod
    def make_norm(config, **kw):
        return LayerNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        del self._children["mlp"]
        object.__delattr__(self, "mlp")
        self.block_sparse_moe = PhimoeSparseMoeBlock(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args, cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.block_sparse_moe(params["block_sparse_moe"], h)
        return residual + h, cache


class PhimoeModel(LlamaModel):
    decoder_layer_cls = PhimoeDecoderLayer

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        setattr(self, self.norm_name,
                LayerNorm(config.hidden_size, config.rms_norm_eps,
                          dtype=dtype, param_dtype=param_dtype))


class PhimoeForCausalLM(LlamaForCausalLM):
    config_class = PhimoeConfig
    model_cls = PhimoeModel

    def __init__(self, config, *, dtype=None, param_dtype=None, **kw):
        import jax.numpy as jnp2

        super().__init__(config, dtype=dtype or jnp2.float32, param_dtype=param_dtype)
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.hidden_size, config.vocab_size,
                                  config.lm_head_bias, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  kernel_init=normal_init(config.initializer_range))


class PhimoeModelStandalone(LlamaModelStandalone):
    config_class = PhimoeConfig
    model_cls = PhimoeModel
