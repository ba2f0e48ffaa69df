"""YOSO (reference models/yoso/modeling_yoso.py).

You-Only-Sample-Once Bernoulli attention. The deployed/default path is the
*expectation* form (``use_expectation=True``): q/k are L2-normalized and the
LSH collision probability ``(1 - acos(q·k)/pi) ** hash_code_len`` is used as
the (unnormalized) attention weight, with the context L2-normalized after
(:104-116, :391-407). The sampled-LSH CUDA path is a GPU-only estimator of
the same expectation and is not reproduced; on TPU the exact expectation is
both the reference default and the MXU-friendly form. An optional depthwise
conv branch over v (:319-327). Position ids offset by +2 (:238-240).

Mask quirk kept for parity: the model hands the *binary* [B,S] mask to
attention, which maps it through ``int(1 + m/1e4)`` — identically 1 — so
padding only affects the conv branch (:348, :356-363).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput, MaskedLMOutput, SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation


class YosoConfig(PretrainedConfig):
    model_type = "yoso"

    def __init__(self, vocab_size=50265, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=4096, type_vocab_size=1,
                 initializer_range=0.02, layer_norm_eps=1e-12,
                 position_embedding_type="absolute", use_expectation=True,
                 hash_code_len=9, num_hash=64, conv_window=None, use_fast_hash=True,
                 lsh_backward=True, pad_token_id=1, bos_token_id=0, eos_token_id=2,
                 **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.position_embedding_type = position_embedding_type
        self.use_expectation = use_expectation
        self.hash_code_len = hash_code_len
        self.num_hash = num_hash
        self.conv_window = conv_window
        self.use_fast_hash = use_fast_hash
        self.lsh_backward = lsh_backward
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)


def _l2norm(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class YosoSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.hash_code_len = config.hash_code_len
        self.conv_window = config.conv_window
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.query = Linear(h, h, True, **kw)
        self.key = Linear(h, h, True, **kw)
        self.value = Linear(h, h, True, **kw)

    def init(self, rng):
        params = super().init(rng)
        if self.conv_window is not None:
            params["conv"] = {"weight": normal_init(0.02)(
                rng, (self.num_heads, 1, self.conv_window, 1), self.param_dtype)}
        return params

    def __call__(self, params, hidden, attention_mask):
        b, s, _ = hidden.shape
        shape = (b, s, self.num_heads, self.head_dim)
        q = self.query(params["query"], hidden).reshape(shape).transpose(0, 2, 1, 3)
        k = self.key(params["key"], hidden).reshape(shape).transpose(0, 2, 1, 3)
        v = self.value(params["value"], hidden).reshape(shape).transpose(0, 2, 1, 3)

        conv_v = None
        if self.conv_window is not None:
            pad = self.conv_window // 2
            w = params["conv"]["weight"].astype(v.dtype)
            conv_v = jax.lax.conv_general_dilated(
                v * attention_mask[:, None, :, None].astype(v.dtype), w,
                window_strides=(1, 1), padding=((pad, pad), (0, 0)),
                feature_group_count=self.num_heads,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        # reference mask transform (int(1 + m/1e4)): all-ones for binary masks
        m = (1.0 + attention_mask.astype(jnp.float32) / 10000.0).astype(jnp.int32)
        m = m[:, None, :].astype(jnp.float32)  # [B,1,S] broadcast over heads

        q = _l2norm(q)
        k = _l2norm(k)
        qk = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        expectation = (1.0 - jnp.arccos(jnp.clip(qk, -1.0, 1.0)) / math.pi) ** self.hash_code_len
        expectation = expectation * m[:, :, :, None] * m[:, :, None, :]
        ctx = jnp.einsum("bhqk,bhkd->bhqd", expectation, v)
        ctx = _l2norm(ctx)
        if conv_v is not None:
            ctx = ctx + conv_v
        return ctx.transpose(0, 2, 1, 3).reshape(b, s, -1)


class _OutDense(Module):
    def __init__(self, in_dim, out_dim, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(in_dim, out_dim, True, dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))
        self.LayerNorm = LayerNorm(out_dim, config.layer_norm_eps, dtype=dtype,
                                   param_dtype=param_dtype)

    def __call__(self, params, hidden, residual):
        return self.LayerNorm(params["LayerNorm"],
                              self.dense(params["dense"], hidden) + residual)


class YosoLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        attention = Module(**kw)
        setattr(attention, "self", YosoSelfAttention(config, **kw))
        attention.output = _OutDense(config.hidden_size, config.hidden_size, config, **kw)
        self.attention = attention
        inter = Module(**kw)
        inter.dense = Linear(config.hidden_size, config.intermediate_size, True,
                             kernel_init=normal_init(config.initializer_range), **kw)
        self.intermediate = inter
        self.output = _OutDense(config.intermediate_size, config.hidden_size, config, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, attention_mask):
        ap = params["attention"]
        attn = getattr(self.attention, "self")(ap["self"], hidden, attention_mask)
        hidden = self.attention.output(ap["output"], attn, hidden)
        inner = self.act(self.intermediate.dense(params["intermediate"]["dense"], hidden))
        return self.output(params["output"], inner, hidden)


class YosoModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ekw = dict(**kw, embedding_init=normal_init(config.initializer_range))
        embeddings = Module(**kw)
        embeddings.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **ekw)
        embeddings.position_embeddings = Embedding(config.max_position_embeddings + 2,
                                                   config.hidden_size, **ekw)
        embeddings.token_type_embeddings = Embedding(config.type_vocab_size,
                                                     config.hidden_size, **ekw)
        embeddings.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.embeddings = embeddings
        encoder = Module(**kw)
        encoder.layer = [YosoLayer(config, **kw) for _ in range(config.num_hidden_layers)]
        self.encoder = encoder

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, output_hidden_states=False,
                 **kwargs) -> BaseModelOutput:
        emb = params["embeddings"]
        if inputs_embeds is None:
            inputs_embeds = self.embeddings.word_embeddings(emb["word_embeddings"], input_ids)
        b, s = inputs_embeds.shape[:2]
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None] + 2
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        h = (inputs_embeds
             + self.embeddings.position_embeddings(emb["position_embeddings"], position_ids)
             + self.embeddings.token_type_embeddings(emb["token_type_embeddings"], token_type_ids))
        h = self.embeddings.LayerNorm(emb["LayerNorm"], h)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layer):
            if output_hidden_states:
                all_hidden.append(h)
            h = layer(params["encoder"]["layer"][str(i)], h, attention_mask)
        if output_hidden_states:
            all_hidden.append(h)
        return BaseModelOutput(
            last_hidden_state=h,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class YosoPreTrainedModel(PreTrainedModel):
    config_class = YosoConfig
    base_model_prefix = "yoso"
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)


class YosoModelStandalone(YosoPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.yoso = YosoModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.yoso(params["yoso"], *args, **kwargs)


class _MLMHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        transform = Module(**kw)
        transform.dense = Linear(config.hidden_size, config.hidden_size, True,
                                 kernel_init=normal_init(config.initializer_range), **kw)
        transform.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.transform = transform
        self.act = get_activation(config.hidden_act)
        self.vocab_size = config.vocab_size

    def init(self, rng):
        params = super().init(rng)
        params["bias"] = jnp.zeros((self.vocab_size,), self.param_dtype)
        return params

    def __call__(self, params, hidden, table):
        h = self.act(self.transform.dense(params["transform"]["dense"], hidden))
        h = self.transform.LayerNorm(params["transform"]["LayerNorm"], h)
        return jnp.dot(h, table.T) + params["bias"]


class YosoForMaskedLM(YosoPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$", r"cls\.predictions\.decoder\.")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.yoso = YosoModel(config, **kw)
        cls = Module(**kw)
        cls.predictions = _MLMHead(config, **kw)
        self.cls = cls

    def get_input_embedding_path(self):
        return "yoso.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None,
                 output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        out = self.yoso(params["yoso"], input_ids, attention_mask, token_type_ids,
                        position_ids, inputs_embeds, output_hidden_states)
        table = params["yoso"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls.predictions(params["cls"]["predictions"],
                                      out.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)


class YosoForSequenceClassification(YosoPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.num_labels = config.num_labels
        self.yoso = YosoModel(config, **kw)
        classifier = Module(**kw)
        classifier.dense = Linear(config.hidden_size, config.hidden_size, True,
                                  kernel_init=normal_init(config.initializer_range), **kw)
        classifier.out_proj = Linear(config.hidden_size, config.num_labels, True,
                                     kernel_init=normal_init(config.initializer_range), **kw)
        self.classifier = classifier
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None, **kwargs):
        out = self.yoso(params["yoso"], input_ids, attention_mask, token_type_ids,
                        position_ids, inputs_embeds)
        x = out.last_hidden_state[:, 0]
        x = self.act(self.classifier.dense(params["classifier"]["dense"], x))
        logits = self.classifier.out_proj(params["classifier"]["out_proj"], x)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits,
                                        hidden_states=out.hidden_states)
