"""RoFormer (reference src/transformers/models/roformer/modeling_roformer.py).

BERT skeleton with rotary position embeddings: the embeddings drop absolute
positions (word + token-type only), and every attention layer rotates Q/K
(optionally V, ``rotary_value``) with an interleaved-pair rotation driven by
a sinusoidal table stored at ``encoder.embed_positions.weight`` ([sin | cos]
halves, RoFormerSinusoidalPositionalEmbedding)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ...core.module import Embedding, Linear, Module, normal_init
from ...modeling_outputs import MaskedLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.attention import get_attention_fn
from ..bert.modeling_bert import (
    BertEmbeddings,
    BertIntermediate,
    BertLayer,
    BertModel,
    BertOutput,
    BertSelfAttention,
    BertSelfOutput,
    _BertOnlyMLMHead,
)
from .configuration_roformer import RoFormerConfig


def _sinusoid_table(n_pos, dim):
    """[sin(f_j) | cos(f_j)] halves (reference _init_weight)."""
    pos_enc = np.array([[p / np.power(10000, 2 * (j // 2) / dim) for j in range(dim)]
                        for p in range(n_pos)])
    out = np.zeros((n_pos, dim), np.float32)
    sentinel = dim // 2 if dim % 2 == 0 else dim // 2 + 1
    out[:, :sentinel] = np.sin(pos_enc[:, 0::2])
    out[:, sentinel:] = np.cos(pos_enc[:, 1::2])
    return out


def _apply_rotary(sinusoidal, x):
    """Interleaved rotation (reference apply_rotary_position_embeddings).

    sinusoidal [S, D]; x [B, S, H, D]."""
    d = sinusoidal.shape[-1]
    sin, cos = sinusoidal[:, :d // 2], sinusoidal[:, d // 2:]
    sin_pos = jnp.repeat(sin, 2, axis=-1)[None, :, None, :]
    cos_pos = jnp.repeat(cos, 2, axis=-1)[None, :, None, :]
    rot = jnp.stack([-x[..., 1::2], x[..., ::2]], axis=-1).reshape(x.shape)
    return x * cos_pos + rot * sin_pos


class RoFormerEmbeddings(BertEmbeddings):
    """Word + token-type only (no absolute positions), dims = embedding_size."""

    def __init__(self, config, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        from ...core.module import LayerNorm

        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        self.word_embeddings = Embedding(config.vocab_size, config.embedding_size, **kw)
        self.token_type_embeddings = Embedding(config.type_vocab_size, config.embedding_size, **kw)
        self.LayerNorm = LayerNorm(config.embedding_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)
        self.pad_token_id = config.pad_token_id

    def __call__(self, params, input_ids, token_type_ids=None, position_ids=None,
                 inputs_embeds=None):
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros(inputs_embeds.shape[:2], jnp.int32)
        h = inputs_embeds + self.token_type_embeddings(params["token_type_embeddings"],
                                                       token_type_ids)
        return self.LayerNorm(params["LayerNorm"], h)


class RoFormerSelfAttention(BertSelfAttention):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.rotary_value = config.rotary_value

    def __call__(self, params, hidden, attn_args, sinusoidal=None):
        b, s, e = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        q = _apply_rotary(sinusoidal, q)
        k = _apply_rotary(sinusoidal, k)
        if self.rotary_value:
            v = _apply_rotary(sinusoidal, v)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.head_dim**-0.5, **attn_args)
        return out.reshape(b, s, e)


class RoFormerAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.self = RoFormerSelfAttention(config, dtype=dtype, param_dtype=param_dtype)
        self.output = BertSelfOutput(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, attn_args, sinusoidal):
        out = self.self(params["self"], hidden, attn_args, sinusoidal)
        return self.output(params["output"], out, hidden)


class RoFormerLayer(BertLayer):
    def __init__(self, config, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = RoFormerAttention(config, **kw)
        self.intermediate = BertIntermediate(config, **kw)
        self.output = BertOutput(config, **kw)

    def __call__(self, params, hidden, attn_args, sinusoidal):
        hidden = self.attention(params["attention"], hidden, attn_args, sinusoidal)
        inner = self.intermediate(params["intermediate"], hidden)
        return self.output(params["output"], inner, hidden)


class RoFormerEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.layer = [RoFormerLayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]
        self.max_pos = config.max_position_embeddings

    def init(self, rng):
        params = super().init(rng)
        params["embed_positions"] = {
            "weight": jnp.asarray(_sinusoid_table(self.max_pos, self.head_dim))}
        return params

    def __call__(self, params, hidden, attn_args, output_hidden_states=False):
        s = hidden.shape[1]
        sinusoidal = params["embed_positions"]["weight"][:s].astype(jnp.float32)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layer):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["layer"][str(i)], hidden, attn_args, sinusoidal)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class RoFormerModel(BertModel):
    embeddings_cls = RoFormerEmbeddings
    encoder_cls = RoFormerEncoder

    def __init__(self, config, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype,
                         add_pooling_layer=False)
        if config.embedding_size != config.hidden_size:
            self.embeddings_project = Linear(
                config.embedding_size, config.hidden_size, True, dtype=dtype,
                param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        else:
            self.embeddings_project = None

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, output_hidden_states=False,
                 output_attentions=False):
        hidden = self.embeddings(params["embeddings"], input_ids, token_type_ids,
                                 position_ids, inputs_embeds)
        if self.embeddings_project is not None:
            hidden = self.embeddings_project(params["embeddings_project"], hidden)
        b, s, _ = hidden.shape
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        hidden, all_hidden = self.encoder(params["encoder"], hidden, attn_args,
                                          output_hidden_states)
        from ...modeling_outputs import BaseModelOutputWithPooling

        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=None,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class RoFormerPreTrainedModel(PreTrainedModel):
    config_class = RoFormerConfig
    base_model_prefix = "roformer"


class RoFormerModelStandalone(RoFormerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.roformer = RoFormerModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.roformer(params["roformer"], *args, **kwargs)


class RoFormerForMaskedLM(RoFormerPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"cls\.predictions\.decoder\.", r"\.position_ids$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.roformer = RoFormerModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.cls = _BertOnlyMLMHead(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "roformer.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None,
                 output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        outputs = self.roformer(params["roformer"], input_ids, attention_mask,
                                token_type_ids, position_ids, inputs_embeds,
                                output_hidden_states)
        table = params["roformer"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls(params["cls"], outputs.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)
