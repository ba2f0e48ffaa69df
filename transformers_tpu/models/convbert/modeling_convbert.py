"""ConvBERT, TPU-native (reference src/transformers/models/convbert/modeling_convbert.py).

Mixed-attention encoder: half the head budget is standard self-attention,
the other half is span-based dynamic convolution — a depthwise-separable
conv over keys produces per-position kernels (softmax over the span) that
mix unfolded value windows.  The unfold+matmul is expressed as a gather +
batched einsum (static shapes).  ELECTRA-style embedding factorization and
generator MLM head.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (BaseModelOutput, MaskedLMOutput,
                                 SequenceClassifierOutput)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.masks import to_additive
from ..bert.modeling_bert import BertEmbeddings
from .configuration_convbert import ConvBertConfig


class SeparableConv1D(Module):
    """depthwise conv + pointwise conv + free bias (reference SeparableConv1D)."""

    def __init__(self, config, cin, cout, kernel_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.cin, self.cout, self.k = cin, cout, kernel_size
        self._std = config.initializer_range

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        return {
            "depthwise": {"weight": (jax.random.normal(k1, (self.cin, 1, self.k))
                                     * self._std).astype(self.param_dtype)},
            "pointwise": {"weight": (jax.random.normal(k2, (self.cout, self.cin, 1))
                                     * self._std).astype(self.param_dtype)},
            "bias": jnp.zeros((self.cout, 1), self.param_dtype),
        }

    def __call__(self, params, x):  # [b, c, t]
        dw = params["depthwise"]["weight"].astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), dw, (1,), [(self.k // 2, self.k // 2)],
            dimension_numbers=("NCW", "OIW", "NCW"), feature_group_count=self.cin)
        pw = params["pointwise"]["weight"].astype(self.dtype)[..., 0]  # [cout, cin]
        y = jnp.einsum("bct,oc->bot", y, pw)
        return y + params["bias"].astype(self.dtype)[None]


class ConvBertSelfAttention(Module):
    def __init__(self, config: ConvBertConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        new_heads = config.num_attention_heads // config.head_ratio
        if new_heads < 1:
            new_heads = 1
        self.num_heads = new_heads
        self.k = config.conv_kernel_size
        self.head_dim = (config.hidden_size // new_heads) // 2
        self.all_head_size = self.num_heads * self.head_dim
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.query = Linear(h, self.all_head_size, True, **kw)
        self.key = Linear(h, self.all_head_size, True, **kw)
        self.value = Linear(h, self.all_head_size, True, **kw)
        self.key_conv_attn_layer = SeparableConv1D(config, h, self.all_head_size,
                                                   self.k, dtype=dtype,
                                                   param_dtype=param_dtype)
        self.conv_kernel_layer = Linear(self.all_head_size,
                                        self.num_heads * self.k, True, **kw)
        self.conv_out_layer = Linear(h, self.all_head_size, True, **kw)

    def __call__(self, params, hidden, mask_bias):
        b, s, _ = hidden.shape
        q_mixed = self.query(params["query"], hidden)
        k_mixed = self.key(params["key"], hidden)
        v_mixed = self.value(params["value"], hidden)
        key_conv = self.key_conv_attn_layer(params["key_conv_attn_layer"],
                                            jnp.swapaxes(hidden, 1, 2))
        key_conv = jnp.swapaxes(key_conv, 1, 2)          # [b, s, A]

        # dynamic conv kernels: softmax over the span per (pos, head)
        conv_attn = key_conv * q_mixed
        kernels = self.conv_kernel_layer(params["conv_kernel_layer"], conv_attn)
        kernels = jax.nn.softmax(
            kernels.reshape(b, s, self.num_heads, self.k), axis=-1)

        # unfolded value windows: [b, s, k, A]
        conv_out = self.conv_out_layer(params["conv_out_layer"], hidden)
        pad = (self.k - 1) // 2
        padded = jnp.pad(conv_out, ((0, 0), (pad, self.k - 1 - pad), (0, 0)))
        idx = jnp.arange(s)[:, None] + jnp.arange(self.k)[None, :]
        windows = padded[:, idx]                          # [b, s, k, A]
        windows = windows.reshape(b, s, self.k, self.num_heads, self.head_dim)
        conv_ctx = jnp.einsum("bskhd,bshk->bshd", windows, kernels)
        conv_ctx = conv_ctx.reshape(b, s, self.all_head_size)

        q = q_mixed.reshape(b, s, self.num_heads, self.head_dim)
        kk = k_mixed.reshape(b, s, self.num_heads, self.head_dim)
        v = v_mixed.reshape(b, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, kk) / math.sqrt(self.head_dim)
        scores = scores.astype(jnp.float32) + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)     # [b, s, nh, hd]
        # concat attention heads and conv heads along the head axis
        out = jnp.concatenate(
            [ctx, conv_ctx.reshape(b, s, self.num_heads, self.head_dim)], axis=2)
        return out.reshape(b, s, 2 * self.all_head_size)


class _GroupedLinear(Module):
    """GroupedLinearLayer (reference): weight [g, in/g, out/g] + bias [out]."""

    def __init__(self, din, dout, groups, std, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.din, self.dout, self.groups, self._std = din, dout, groups, std

    def init(self, rng):
        g = self.groups
        return {"weight": (jax.random.normal(rng, (g, self.din // g, self.dout // g))
                           * self._std).astype(self.param_dtype),
                "bias": jnp.zeros((self.dout,), self.param_dtype)}

    def __call__(self, params, x):
        b, s, _ = x.shape
        g = self.groups
        xg = x.reshape(b, s, g, self.din // g)
        out = jnp.einsum("bsgi,gio->bsgo", xg, params["weight"].astype(self.dtype))
        return out.reshape(b, s, self.dout) + params["bias"].astype(self.dtype)


def _ffn_dense(config, din, dout, *, dtype, param_dtype):
    if config.num_groups == 1:
        return Linear(din, dout, True, dtype=dtype, param_dtype=param_dtype,
                      kernel_init=normal_init(config.initializer_range))
    return _GroupedLinear(din, dout, config.num_groups, config.initializer_range,
                          dtype=dtype, param_dtype=param_dtype)


class ConvBertLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        self.attention = _AttnWrapper(config, **kw)
        self.intermediate = _Intermediate(config, **kw)
        self.output = _Output(config, **kw)

    def __call__(self, params, hidden, mask_bias):
        attn = self.attention(params["attention"], hidden, mask_bias)
        inter = self.intermediate(params["intermediate"], attn)
        return self.output(params["output"], inter, attn)


class _AttnWrapper(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "self", ConvBertSelfAttention(config, **kw))
        self.output = _SelfOutput(config, **kw)

    def __call__(self, params, hidden, mask_bias):
        ctx = getattr(self, "self")(params["self"], hidden, mask_bias)
        return self.output(params["output"], ctx, hidden)


class _SelfOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, residual):
        return self.LayerNorm(params["LayerNorm"],
                              self.dense(params["dense"], hidden) + residual)


class _Intermediate(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = _ffn_dense(config, config.hidden_size,
                                config.intermediate_size, dtype=dtype,
                                param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.act(self.dense(params["dense"], x))


class _Output(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = _ffn_dense(config, config.intermediate_size,
                                config.hidden_size, dtype=dtype,
                                param_dtype=param_dtype)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, residual):
        h = self.dense(params["dense"], hidden)
        return self.LayerNorm(params["LayerNorm"], h + residual)


class ConvBertModel(Module):
    def __init__(self, config: ConvBertConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = BertEmbeddings(_EmbView(config), **kw)
        if config.embedding_size != config.hidden_size:
            self.embeddings_project = Linear(config.embedding_size,
                                             config.hidden_size, True,
                                             kernel_init=normal_init(config.initializer_range),
                                             **kw)
        self.encoder = _Encoder(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 output_hidden_states=False, **kwargs) -> BaseModelOutput:
        hidden = self.embeddings(params["embeddings"], input_ids, token_type_ids,
                                 position_ids, inputs_embeds)
        if self.config.embedding_size != self.config.hidden_size:
            hidden = self.embeddings_project(params["embeddings_project"], hidden)
        b, s, _ = hidden.shape
        mask = (attention_mask if attention_mask is not None
                else jnp.ones((b, s), jnp.int32))
        mask_bias = to_additive(mask.astype(bool)[:, None, None, :], jnp.float32)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layer):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["encoder"]["layer"][str(i)], hidden, mask_bias)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutput(last_hidden_state=hidden,
                               hidden_states=tuple(all_hidden)
                               if all_hidden is not None else None)


class _EmbView:
    """config facade so BertEmbeddings uses embedding_size."""

    def __init__(self, config):
        self._c = config

    def __getattr__(self, name):
        if name == "hidden_size":
            return self._c.embedding_size
        return getattr(self._c, name)


class _Encoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [ConvBertLayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]


class ConvBertPreTrainedModel(PreTrainedModel):
    config_class = ConvBertConfig
    base_model_prefix = "convbert"
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)


class ConvBertModelStandalone(ConvBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.convbert = ConvBertModel(config, dtype=self.dtype,
                                      param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.convbert(params["convbert"], *args, **kwargs)


class ConvBertForMaskedLM(ConvBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.convbert = ConvBertModel(config, **kw)
        self.generator_predictions = _GeneratorPredictions(config, **kw)
        self.generator_lm_head = Linear(config.embedding_size, config.vocab_size,
                                        True,
                                        kernel_init=normal_init(config.initializer_range),
                                        **kw)

    def get_input_embedding_path(self):
        return "convbert.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ("generator_lm_head.weight",)

    def tie_weights(self, params):
        params["generator_lm_head"]["weight"] = \
            params["convbert"]["embeddings"]["word_embeddings"]["weight"].T
        return params

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 labels=None, **kwargs) -> MaskedLMOutput:
        out = self.convbert(params["convbert"], input_ids, attention_mask,
                            token_type_ids, position_ids, inputs_embeds)
        h = self.generator_predictions(params["generator_predictions"],
                                       out.last_hidden_state)
        logits = self.generator_lm_head(params["generator_lm_head"], h)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits)


class _GeneratorPredictions(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.LayerNorm = LayerNorm(config.embedding_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.embedding_size, True,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, x):
        h = jax.nn.gelu(self.dense(params["dense"], x), approximate=False)
        return self.LayerNorm(params["LayerNorm"], h)


class ConvBertForSequenceClassification(ConvBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.convbert = ConvBertModel(config, **kw)
        self.classifier = _ClassificationHead(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs):
        out = self.convbert(params["convbert"], input_ids, attention_mask,
                            token_type_ids)
        logits = self.classifier(params["classifier"], out.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)


class _ClassificationHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.dense = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.out_proj = Linear(config.hidden_size, config.num_labels, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        x = self.act(self.dense(params["dense"], hidden[:, 0]))
        return self.out_proj(params["out_proj"], x)
