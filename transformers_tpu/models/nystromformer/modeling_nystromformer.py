"""Nystromformer (reference models/nystromformer/modeling_nystromformer.py).

Nystrom-approximated attention: segment-mean landmarks for q/k (:182-196),
three softmax kernels with the landmark Gram matrix pseudo-inverted by a
6-step Newton-Schulz iteration (:140-159), plus a depthwise conv over the
value stream (:129-137, :211-212). q and k are each pre-scaled by
``dh**-1/4`` (:167-168). Embeddings offset position ids by +2 (:59-61).
BERT-style block/heads otherwise (``cls.predictions`` MLM head).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput, MaskedLMOutput, SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...configuration_utils import PretrainedConfig
from ...ops.activations import get_activation


class NystromformerConfig(PretrainedConfig):
    model_type = "nystromformer"

    def __init__(self, vocab_size=30000, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072, hidden_act="gelu_new",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=510, type_vocab_size=2,
                 segment_means_seq_len=64, num_landmarks=64, conv_kernel_size=65,
                 inv_coeff_init_option=False, initializer_range=0.02,
                 layer_norm_eps=1e-5, pad_token_id=1, bos_token_id=0, eos_token_id=2,
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
        self.segment_means_seq_len = segment_means_seq_len
        self.num_landmarks = num_landmarks
        self.conv_kernel_size = conv_kernel_size
        self.inv_coeff_init_option = inv_coeff_init_option
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)


def iterative_inv(mat, n_iter=6):
    """Newton-Schulz Moore-Penrose approximation (reference :140-159)."""
    identity = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    key = mat
    value = 1.0 / jnp.max(jnp.sum(key, axis=-2)) * jnp.swapaxes(key, -1, -2)
    for _ in range(n_iter):
        kv = jnp.matmul(key, value)
        value = jnp.matmul(
            0.25 * value,
            13 * identity - jnp.matmul(kv, 15 * identity - jnp.matmul(kv, 7 * identity - kv)))
    return value


class NystromformerSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.num_landmarks = config.num_landmarks
        self.seq_len = config.segment_means_seq_len
        self.conv_kernel_size = config.conv_kernel_size
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.query = Linear(h, h, True, **kw)
        self.key = Linear(h, h, True, **kw)
        self.value = Linear(h, h, True, **kw)

    def init(self, rng):
        params = super().init(rng)
        if self.conv_kernel_size is not None:
            conv = {"weight": normal_init(0.02)(
                rng, (self.num_heads, 1, self.conv_kernel_size, 1), self.param_dtype)}
            params["conv"] = conv
        return params

    def __call__(self, params, hidden, mask_bias):
        b, s, _ = hidden.shape
        shape = (b, s, self.num_heads, self.head_dim)
        q = self.query(params["query"], hidden).reshape(shape).transpose(0, 2, 1, 3)
        k = self.key(params["key"], hidden).reshape(shape).transpose(0, 2, 1, 3)
        v = self.value(params["value"], hidden).reshape(shape).transpose(0, 2, 1, 3)
        q = q / math.sqrt(math.sqrt(self.head_dim))
        k = k / math.sqrt(math.sqrt(self.head_dim))

        if self.num_landmarks == self.seq_len:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
            if mask_bias is not None:
                scores = scores + mask_bias
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        else:
            seg = self.seq_len // self.num_landmarks
            q_land = q.reshape(b, self.num_heads, self.num_landmarks, seg,
                               self.head_dim).mean(axis=-2)
            k_land = k.reshape(b, self.num_heads, self.num_landmarks, seg,
                               self.head_dim).mean(axis=-2)
            kernel_1 = jax.nn.softmax(jnp.einsum("bhqd,bhld->bhql", q, k_land), axis=-1)
            kernel_2 = jax.nn.softmax(jnp.einsum("bhqd,bhld->bhql", q_land, k_land), axis=-1)
            scores = jnp.einsum("bhld,bhkd->bhlk", q_land, k)
            if mask_bias is not None:
                scores = scores + mask_bias
            kernel_3 = jax.nn.softmax(scores, axis=-1)
            new_v = jnp.einsum("bhlk,bhkd->bhld", kernel_3, v)
            ctx = jnp.einsum("bhql,bhld->bhqd",
                             jnp.matmul(kernel_1, iterative_inv(kernel_2)), new_v)

        if self.conv_kernel_size is not None:
            # depthwise conv over the sequence axis of v (reference Conv2d
            # [heads,1,k,1] with groups=heads)
            w = params["conv"]["weight"].astype(v.dtype)
            pad = self.conv_kernel_size // 2
            ctx = ctx + jax.lax.conv_general_dilated(
                v, w, window_strides=(1, 1), padding=((pad, pad), (0, 0)),
                feature_group_count=self.num_heads,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
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


class NystromformerLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        attention = Module(**kw)
        setattr(attention, "self", NystromformerSelfAttention(config, **kw))
        attention.output = _OutDense(config.hidden_size, config.hidden_size, config, **kw)
        self.attention = attention
        inter = Module(**kw)
        inter.dense = Linear(config.hidden_size, config.intermediate_size, True,
                             kernel_init=normal_init(config.initializer_range), **kw)
        self.intermediate = inter
        self.output = _OutDense(config.intermediate_size, config.hidden_size, config, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, mask_bias):
        ap = params["attention"]
        attn = getattr(self.attention, "self")(ap["self"], hidden, mask_bias)
        hidden = self.attention.output(ap["output"], attn, hidden)
        inner = self.act(self.intermediate.dense(params["intermediate"]["dense"], hidden))
        return self.output(params["output"], inner, hidden)


class NystromformerModel(Module):
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
        encoder.layer = [NystromformerLayer(config, **kw)
                         for _ in range(config.num_hidden_layers)]
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
        h = (inputs_embeds
             + self.embeddings.token_type_embeddings(emb["token_type_embeddings"], token_type_ids)
             + self.embeddings.position_embeddings(emb["position_embeddings"], position_ids))
        h = self.embeddings.LayerNorm(emb["LayerNorm"], h)
        mask_bias = None
        if attention_mask is not None:
            mask_bias = ((1.0 - attention_mask[:, None, None, :].astype(jnp.float32))
                         * jnp.finfo(jnp.float32).min)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layer):
            if output_hidden_states:
                all_hidden.append(h)
            h = layer(params["encoder"]["layer"][str(i)], h, mask_bias)
        if output_hidden_states:
            all_hidden.append(h)
        return BaseModelOutput(
            last_hidden_state=h,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class NystromformerPreTrainedModel(PreTrainedModel):
    config_class = NystromformerConfig
    base_model_prefix = "nystromformer"
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)


class NystromformerModelStandalone(NystromformerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.nystromformer = NystromformerModel(config, dtype=self.dtype,
                                                param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.nystromformer(params["nystromformer"], *args, **kwargs)


class _MLMHead(Module):
    """cls.predictions: transform + tied decoder + bias."""

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


class NystromformerForMaskedLM(NystromformerPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",
                                          r"cls\.predictions\.decoder\.")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.nystromformer = NystromformerModel(config, **kw)
        cls = Module(**kw)
        cls.predictions = _MLMHead(config, **kw)
        self.cls = cls

    def get_input_embedding_path(self):
        return "nystromformer.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None,
                 output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        out = self.nystromformer(params["nystromformer"], input_ids, attention_mask,
                                 token_type_ids, position_ids, inputs_embeds,
                                 output_hidden_states)
        table = params["nystromformer"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls.predictions(params["cls"]["predictions"],
                                      out.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)


class NystromformerForSequenceClassification(NystromformerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.num_labels = config.num_labels
        self.nystromformer = NystromformerModel(config, **kw)
        classifier = Module(**kw)
        classifier.dense = Linear(config.hidden_size, config.hidden_size, True,
                                  kernel_init=normal_init(config.initializer_range), **kw)
        classifier.out_proj = Linear(config.hidden_size, config.num_labels, True,
                                     kernel_init=normal_init(config.initializer_range), **kw)
        self.classifier = classifier
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None, **kwargs):
        out = self.nystromformer(params["nystromformer"], input_ids, attention_mask,
                                 token_type_ids, position_ids, inputs_embeds)
        x = out.last_hidden_state[:, 0]
        x = self.act(self.classifier.dense(params["classifier"]["dense"], x))
        logits = self.classifier.out_proj(params["classifier"]["out_proj"], x)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits,
                                        hidden_states=out.hidden_states)
