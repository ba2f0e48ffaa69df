"""Longformer (reference src/transformers/models/longformer/modeling_longformer.py).

Sliding-window + global attention encoder on the RoBERTa skeleton.

TPU-native: the reference's chunked sliding-window kernels
(`_sliding_chunks_query_key_matmul` etc.) are a CUDA memory optimization;
the math is exactly masked dense attention, so here each layer computes one
dense [S, S] attention with the composed mask:

- non-global query i attends to {j : |i−j| ≤ w/2, j valid, j not global}
  ∪ {all global j} using the standard q/k/v projections;
- global query rows are REPLACED by full attention over all valid tokens
  computed with the separate ``query_global``/``key_global``/``value_global``
  projections (reference :forward tail).

XLA fuses the masked softmax; for long-context serving the pallas
flash-attention kernel applies the same band mask blockwise (ops/pallas).
No window-multiple padding is needed (the reference pads only for its
chunking kernels)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, MaskedLMOutput
from ...modeling_utils import PreTrainedModel
from ..bert.modeling_bert import (
    BertIntermediate,
    BertLayer,
    BertModel,
    BertOutput,
    BertSelfOutput,
)
from ..roberta.modeling_roberta import RobertaEmbeddings, RobertaLMHead
from .configuration_longformer import LongformerConfig


class LongformerSelfAttention(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        window = config.attention_window
        if isinstance(window, (list, tuple)):
            window = window[layer_idx]
        self.one_sided_window = window // 2
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.query = Linear(h, h, True, **kw)
        self.key = Linear(h, h, True, **kw)
        self.value = Linear(h, h, True, **kw)
        self.query_global = Linear(h, h, True, **kw)
        self.key_global = Linear(h, h, True, **kw)
        self.value_global = Linear(h, h, True, **kw)

    def _heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.num_heads, self.head_dim)

    def __call__(self, params, hidden, valid, is_global):
        b, s, e = hidden.shape
        scale = self.head_dim**-0.5
        q = self._heads(self.query(params["query"], hidden)) * scale
        k = self._heads(self.key(params["key"], hidden))
        v = self._heads(self.value(params["value"], hidden))

        idx = jnp.arange(s)
        band = jnp.abs(idx[:, None] - idx[None, :]) <= self.one_sided_window  # [S,S]
        validb = valid.astype(bool)
        gb = is_global.astype(bool) & validb
        # local window excludes global and pad columns; global columns added for all
        mask = (band[None] & validb[:, None, :] & ~gb[:, None, :]) | gb[:, None, :]

        scores = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32), k.astype(jnp.float32))
        scores = jnp.where(mask[:, None, :, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)
        # reference zeroes attention probs at padded QUERY rows (is_index_masked)
        probs = probs * validb[:, None, :, None].astype(probs.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", probs, v.astype(jnp.float32))

        # global rows: full attention with the global projections
        qg = self._heads(self.query_global(params["query_global"], hidden)) * scale
        kg = self._heads(self.key_global(params["key_global"], hidden))
        vg = self._heads(self.value_global(params["value_global"], hidden))
        g_scores = jnp.einsum("bihd,bjhd->bhij", qg.astype(jnp.float32), kg.astype(jnp.float32))
        g_scores = jnp.where(validb[:, None, None, :], g_scores, -jnp.inf)
        g_probs = jax.nn.softmax(g_scores, axis=-1)
        g_out = jnp.einsum("bhij,bjhd->bihd", g_probs, vg.astype(jnp.float32))

        out = jnp.where(gb[:, :, None, None], g_out, out)
        return out.reshape(b, s, e).astype(hidden.dtype)


class LongformerAttention(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.self = LongformerSelfAttention(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.output = BertSelfOutput(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, valid, is_global):
        out = self.self(params["self"], hidden, valid, is_global)
        return self.output(params["output"], out, hidden)


class LongformerLayer(BertLayer):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = LongformerAttention(config, layer_idx, **kw)
        self.intermediate = BertIntermediate(config, **kw)
        self.output = BertOutput(config, **kw)

    def __call__(self, params, hidden, valid, is_global):
        hidden = self.attention(params["attention"], hidden, valid, is_global)
        inner = self.intermediate(params["intermediate"], hidden)
        return self.output(params["output"], inner, hidden)


class LongformerModel(BertModel):
    embeddings_cls = RobertaEmbeddings

    def __init__(self, config, *, dtype, param_dtype, add_pooling_layer=True):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = self.embeddings_cls(config, **kw)
        self.encoder = _LongformerEncoder(config, **kw)
        from ..bert.modeling_bert import BertPooler

        self.pooler = BertPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, global_attention_mask=None,
                 output_hidden_states=False, **kwargs) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, token_type_ids,
                                 position_ids, inputs_embeds)
        b, s, _ = hidden.shape
        valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        is_global = (global_attention_mask if global_attention_mask is not None
                     else jnp.zeros((b, s), jnp.int32))
        hidden, all_hidden = self.encoder(params["encoder"], hidden, valid, is_global,
                                          output_hidden_states)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class _LongformerEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [LongformerLayer(config, i, dtype=dtype, param_dtype=param_dtype)
                      for i in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, valid, is_global, output_hidden_states=False):
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layer):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["layer"][str(i)], hidden, valid, is_global)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class LongformerPreTrainedModel(PreTrainedModel):
    config_class = LongformerConfig
    base_model_prefix = "longformer"


class LongformerModelStandalone(LongformerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.longformer = LongformerModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.longformer(params["longformer"], *args, **kwargs)


class LongformerForMaskedLM(LongformerPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"lm_head\.decoder\.", r"\.position_ids$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.longformer = LongformerModel(config, dtype=self.dtype,
                                          param_dtype=self.param_dtype,
                                          add_pooling_layer=False)
        self.lm_head = RobertaLMHead(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "longformer.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, global_attention_mask=None,
                 labels=None, output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        outputs = self.longformer(params["longformer"], input_ids, attention_mask,
                                  token_type_ids, position_ids, inputs_embeds,
                                  global_attention_mask, output_hidden_states)
        table = params["longformer"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.lm_head(params["lm_head"], outputs.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)
