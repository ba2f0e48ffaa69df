"""Jina Embeddings V3 (reference models/jina_embeddings_v3/modular_jina_embeddings_v3.py).

Bidirectional rope encoder in the GPT-NeoX post-norm arrangement:
- embeddings: word + token_type only (no learned positions), LayerNorm
- layer: attn (rope, biased projections) → residual → post_attention
  LayerNorm; mlp (fc1/act/fc2) → residual → post_mlp LayerNorm
- heads: MaskedLM (XLM-R LM head over the ``roberta``-prefixed base),
  sequence/token classification, QA
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import (Embedding, LayerNorm, Linear, Module, normal_init)
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.rope import apply_rotary_pos_emb, compute_cos_sin, rope_inv_freq
from .configuration_jina_embeddings_v3 import JinaEmbeddingsV3Config


@dataclass
class JinaPoolingOutput(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    pooler_output: Optional[jnp.ndarray] = None
    hidden_states: Optional[tuple] = None


class JinaEmbeddingsV3Embeddings(Module):
    """word + token_type embeddings, LayerNorm (reference :64-97)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **kw)
        self.token_type_embeddings = Embedding(config.type_vocab_size,
                                               config.hidden_size, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_ids=None, token_type_ids=None,
                 inputs_embeds=None):
        x = (inputs_embeds if inputs_embeds is not None
             else self.word_embeddings(params["word_embeddings"], input_ids))
        if token_type_ids is None:
            token_type_ids = jnp.zeros(x.shape[:-1], jnp.int32)
        x = x + self.token_type_embeddings(params["token_type_embeddings"],
                                           token_type_ids)
        return self.LayerNorm(params["LayerNorm"], x)


class JinaEmbeddingsV3Attention(Module):
    """Bidirectional rope attention, biased projections (reference :99-140)."""

    proj_bias = True

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.head_dim
        self.scale = self.head_dim**-0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        d = self.num_heads * self.head_dim
        self.q_proj = Linear(h, d, self.proj_bias, **kw)
        self.k_proj = Linear(h, d, self.proj_bias, **kw)
        self.v_proj = Linear(h, d, self.proj_bias, **kw)
        self.o_proj = Linear(d, h, self.proj_bias, **kw)

    def __call__(self, params, hidden, cos, sin, bias):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        q, k = apply_rotary_pos_emb(q, k, cos, sin)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * self.scale
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        return self.o_proj(params["o_proj"], out.reshape(b, s, -1))


class JinaEmbeddingsV3MLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.fc1 = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class JinaEmbeddingsV3Layer(Module):
    """Post-norm residual arrangement (reference :142-173)."""

    attention_cls = JinaEmbeddingsV3Attention
    mlp_cls = JinaEmbeddingsV3MLP

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = self.attention_cls(config, **kw)
        self.mlp = self.mlp_cls(config, **kw)
        self.post_attention_layernorm = LayerNorm(config.hidden_size,
                                                  config.layer_norm_eps, **kw)
        self.post_mlp_layernorm = LayerNorm(config.hidden_size,
                                            config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, cos, sin, bias):
        h = hidden + self.self_attn(params["self_attn"], hidden, cos, sin, bias)
        h = self.post_attention_layernorm(params["post_attention_layernorm"], h)
        h2 = h + self.mlp(params["mlp"], h)
        return self.post_mlp_layernorm(params["post_mlp_layernorm"], h2)


class JinaEmbeddingsV3Pooler(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden):
        return jnp.tanh(self.dense(params["dense"], hidden[:, 0]))


class JinaEmbeddingsV3Model(Module):
    embeddings_cls = JinaEmbeddingsV3Embeddings
    layer_cls = JinaEmbeddingsV3Layer
    base_model_prefix = "roberta"

    def __init__(self, config, add_pooling_layer=True, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = self.embeddings_cls(config, **kw)
        self.layers = [self.layer_cls(config, **kw)
                       for _ in range(config.num_hidden_layers)]
        if add_pooling_layer:
            self.pooler = JinaEmbeddingsV3Pooler(config, **kw)
        else:
            self.pooler = None
        self.inv_freq, self.attention_scaling = rope_inv_freq(config)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 output_hidden_states=False, **kwargs):
        x = self.embeddings(params["embeddings"], input_ids, token_type_ids,
                            inputs_embeds)
        b, s, _ = x.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
        cos, sin = compute_cos_sin(position_ids, self.inv_freq,
                                   self.attention_scaling, dtype=self.dtype)
        bias = None
        if attention_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            bias = (1.0 - attention_mask.astype(jnp.float32)
                    )[:, None, None, :] * neg
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(x)
            x = layer(params["layers"][str(i)], x, cos, sin, bias)
        if output_hidden_states:
            all_hidden.append(x)
        pooled = (self.pooler(params["pooler"], x)
                  if self.pooler is not None else None)
        return JinaPoolingOutput(
            last_hidden_state=x, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden else None)


class JinaEmbeddingsV3PreTrainedModel(PreTrainedModel):
    config_class = JinaEmbeddingsV3Config
    base_model_prefix = "roberta"
    _keys_to_ignore_on_load_unexpected = (r"inv_freq", r"original_inv_freq")


class JinaEmbeddingsV3ModelStandalone(JinaEmbeddingsV3PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.roberta = JinaEmbeddingsV3Model(config, dtype=self.dtype,
                                             param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.roberta(params["roberta"], *args, **kwargs)


class JinaEmbeddingsV3LMHead(Module):
    """XLM-R-style LM head: dense → gelu → layer_norm → decoder(+bias)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.dense = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                    dtype=dtype, param_dtype=param_dtype)
        self.decoder = Linear(config.hidden_size, config.vocab_size, True, **kw)

    def __call__(self, params, hidden):
        h = jax.nn.gelu(self.dense(params["dense"], hidden))
        h = self.layer_norm(params["layer_norm"], h)
        return self.decoder(params["decoder"], h)


class JinaEmbeddingsV3ForMaskedLM(JinaEmbeddingsV3PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.roberta = JinaEmbeddingsV3Model(config, add_pooling_layer=False, **kw)
        self.lm_head = JinaEmbeddingsV3LMHead(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, labels=None, **kwargs):
        out = self.roberta(params["roberta"], input_ids, attention_mask,
                           token_type_ids, position_ids)
        logits = self.lm_head(params["lm_head"], out.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        from ...modeling_outputs import MaskedLMOutput

        return MaskedLMOutput(loss=loss, logits=logits)
