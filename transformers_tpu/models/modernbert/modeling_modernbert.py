"""ModernBERT encoder, TPU-native.

Semantics match reference src/transformers/models/modernbert/modeling_modernbert.py:
no position embeddings — rotary with DIFFERENT theta for global vs local
layers (:94-128), alternating bidirectional sliding-window / full attention
(layer_types, inclusive |q-kv| <= local_attention//2 window — see
ops/attention._render_bias), fused Wqkv packed [.., 3, H, D] (:246-275),
GeGLU MLP ``act(input) * gate`` with input first (:84-91), pre-norm blocks
with the layer-0 attn_norm REMOVED (Identity, :309-312), final_norm (:420),
MLM head dense→act→norm→tied decoder-with-bias (:481-506), cls/mean
classifier pooling (:609-611).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (
    BaseModelOutputWithPooling,
    MaskedLMOutput,
    SequenceClassifierOutput,
    TokenClassifierOutput,
)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ...ops.rope import apply_rotary_pos_emb, compute_cos_sin
from .configuration_modernbert import ModernBertConfig


class ModernBertEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.tok_embeddings = Embedding(config.vocab_size, config.hidden_size,
                                        embedding_init=normal_init(config.initializer_range),
                                        dtype=dtype, param_dtype=param_dtype)
        self.norm = LayerNorm(config.hidden_size, config.norm_eps, use_bias=config.norm_bias,
                              dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_ids, inputs_embeds=None):
        if inputs_embeds is None:
            inputs_embeds = self.tok_embeddings(params["tok_embeddings"], input_ids)
        return self.norm(params["norm"], inputs_embeds)


class ModernBertAttention(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.sliding_window = (config.sliding_window
                               if config.layer_types[layer_idx] == "sliding_attention" else None)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.Wqkv = Linear(config.hidden_size, 3 * config.hidden_size, config.attention_bias, **kw)
        self.Wo = Linear(config.hidden_size, config.hidden_size, config.attention_bias, **kw)

    def __call__(self, params, hidden, cos, sin, kv_valid):
        b, s, e = hidden.shape
        qkv = self.Wqkv(params["Wqkv"], hidden).reshape(b, s, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q, k = apply_rotary_pos_emb(q, k, cos, sin)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.head_dim**-0.5, kv_valid=kv_valid,
                      is_causal=False, sliding_window=self.sliding_window)
        return self.Wo(params["Wo"], out.reshape(b, s, e))


class ModernBertMLP(Module):
    """GeGLU with the INPUT half first: act(input) * gate (reference :90)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.Wi = Linear(config.hidden_size, config.intermediate_size * 2, config.mlp_bias, **kw)
        self.Wo = Linear(config.intermediate_size, config.hidden_size, config.mlp_bias, **kw)
        self.act = get_activation(config.hidden_activation)

    def __call__(self, params, x):
        inp, gate = jnp.split(self.Wi(params["Wi"], x), 2, axis=-1)
        return self.Wo(params["Wo"], self.act(inp) * gate)


class ModernBertEncoderLayer(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.first = layer_idx == 0
        if not self.first:
            self.attn_norm = LayerNorm(config.hidden_size, config.norm_eps,
                                       use_bias=config.norm_bias, **kw)
        self.attn = ModernBertAttention(config, layer_idx, **kw)
        self.mlp_norm = LayerNorm(config.hidden_size, config.norm_eps,
                                  use_bias=config.norm_bias, **kw)
        self.mlp = ModernBertMLP(config, **kw)

    def __call__(self, params, hidden, cos, sin, kv_valid):
        h = hidden if self.first else self.attn_norm(params["attn_norm"], hidden)
        hidden = hidden + self.attn(params["attn"], h, cos, sin, kv_valid)
        return hidden + self.mlp(params["mlp"], self.mlp_norm(params["mlp_norm"], hidden))


class ModernBertModel(Module):
    def __init__(self, config: ModernBertConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = ModernBertEmbeddings(config, **kw)
        self.layers = [ModernBertEncoderLayer(config, i, **kw)
                       for i in range(config.num_hidden_layers)]
        self.final_norm = LayerNorm(config.hidden_size, config.norm_eps,
                                    use_bias=config.norm_bias, **kw)
        head_dim = config.hidden_size // config.num_attention_heads
        self.global_inv_freq = 1.0 / (config.global_rope_theta ** (
            np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
        self.local_inv_freq = 1.0 / (config.local_rope_theta ** (
            np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 inputs_embeds=None, output_hidden_states=False) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, inputs_embeds)
        b, s, _ = hidden.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
        ropes = {
            "full_attention": compute_cos_sin(position_ids, self.global_inv_freq, dtype=self.dtype),
            "sliding_attention": compute_cos_sin(position_ids, self.local_inv_freq, dtype=self.dtype),
        }
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            cos, sin = ropes[self.config.layer_types[i]]
            hidden = layer(params["layers"][str(i)], hidden, cos, sin, kv_valid)
        hidden = self.final_norm(params["final_norm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=None,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class ModernBertPreTrainedModel(PreTrainedModel):
    config_class = ModernBertConfig
    base_model_prefix = "model"


class ModernBertModelStandalone(ModernBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = ModernBertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.model(params["model"], *args, **kwargs)


class _PredictionHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, config.classifier_bias,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))
        self.norm = LayerNorm(config.hidden_size, config.norm_eps,
                              use_bias=config.norm_bias, dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.classifier_activation)

    def __call__(self, params, x):
        return self.norm(params["norm"], self.act(self.dense(params["dense"], x)))


class ModernBertForMaskedLM(ModernBertPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"^decoder\.weight$",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = ModernBertModel(config, **kw)
        self.head = _PredictionHead(config, **kw)
        self.vocab_size = config.vocab_size
        self.decoder_bias = config.decoder_bias

    def init(self, rng):
        params = super().init(rng)
        if self.decoder_bias:
            params["decoder"] = {"bias": jnp.zeros((self.vocab_size,), self.param_dtype)}
        return params

    def get_input_embedding_path(self):
        return "model.embeddings.tok_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()  # tied via attend()

    def __call__(self, params, input_ids=None, attention_mask=None, labels=None, **kwargs):
        out = self.model(params["model"], input_ids, attention_mask, **kwargs)
        h = self.head(params["head"], out.last_hidden_state)
        logits = self.model.embeddings.tok_embeddings.attend(
            params["model"]["embeddings"]["tok_embeddings"], h)
        if self.decoder_bias:
            logits = logits + params["decoder"]["bias"].astype(logits.dtype)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)


class ModernBertForSequenceClassification(ModernBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = ModernBertModel(config, **kw)
        self.head = _PredictionHead(config, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))
        self.num_labels = config.num_labels

    def __call__(self, params, input_ids=None, attention_mask=None, labels=None, **kwargs):
        out = self.model(params["model"], input_ids, attention_mask, **kwargs)
        hidden = out.last_hidden_state
        if self.config.classifier_pooling == "mean":
            if attention_mask is None:
                pooled = hidden.mean(1)
            else:
                m = attention_mask[..., None].astype(hidden.dtype)
                pooled = (hidden * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        else:
            pooled = hidden[:, 0]
        logits = self.classifier(params["classifier"], self.head(params["head"], pooled))
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)


class ModernBertForTokenClassification(ModernBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = ModernBertModel(config, **kw)
        self.head = _PredictionHead(config, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))
        self.num_labels = config.num_labels

    def __call__(self, params, input_ids=None, attention_mask=None, labels=None, **kwargs):
        out = self.model(params["model"], input_ids, attention_mask, **kwargs)
        logits = self.classifier(params["classifier"], self.head(params["head"], out.last_hidden_state))
        loss = None
        if labels is not None:
            from ...loss import for_token_classification_loss

            loss = for_token_classification_loss(logits, labels, self.config)
        return TokenClassifierOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)
