"""ESM-1b/ESM-2 protein language models, TPU-native (reference
src/transformers/models/esm/modeling_esm.py).

Pre-LN encoder with ESM quirks kept exactly:
- query (not logits) scaled by head_dim**-0.5 BEFORE rotary (ESM-2) so the
  rotation commutes correctly (reference comment in EsmSelfAttention);
- optional ``token_dropout`` mask-ratio rescaling of embeddings
  ((1-0.12) / (1-observed mask fraction));
- pad-aware absolute positions (RoBERTa offsets) or rotary (ESM-2);
- embeddings multiplied by the attention mask; final
  ``encoder.emb_layer_norm_after``; gelu MLM head with untied decoder weight
  loaded from the checkpoint; ``contact_head`` regression weights retained."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, MaskedLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import gelu_exact
from .configuration_esm import EsmConfig


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


class EsmSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.rotary = config.position_embedding_type == "rotary"
        if self.rotary:
            self.inv_freq = 1.0 / (10000 ** (np.arange(0, self.head_dim, 2,
                                                       dtype=np.float64) / self.head_dim))
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.query = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.key = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.value = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def __call__(self, params, hidden, kv_valid):
        b, s, e = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        # ESM scales the QUERY, before rotary
        q = q * (self.head_dim**-0.5)
        if self.rotary:
            t = jnp.arange(s, dtype=jnp.float32)
            freqs = t[:, None] * jnp.asarray(self.inv_freq, jnp.float32)[None, :]
            emb = jnp.concatenate([freqs, freqs], axis=-1)
            cos = jnp.cos(emb)[None, :, None, :]
            sin = jnp.sin(emb)[None, :, None, :]
            q = (q * cos) + (_rotate_half(q) * sin)
            k = (k * cos) + (_rotate_half(k) * sin)
        scores = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32), k.astype(jnp.float32))
        scores = jnp.where(kv_valid.astype(bool)[:, None, None, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", probs, v.astype(jnp.float32))
        return out.reshape(b, s, e).astype(hidden.dtype)


class EsmAttention(Module):
    """Pre-LN: LayerNorm -> self -> dense + residual (reference EsmAttention)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.self = EsmSelfAttention(config, **kw)
        self.output = _EsmSelfOutput(config, **kw)

    def __call__(self, params, hidden, kv_valid):
        h = self.LayerNorm(params["LayerNorm"], hidden)
        out = self.self(params["self"], h, kv_valid)
        return self.output(params["output"], out, hidden)


class _EsmSelfOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True, dtype=dtype,
                            param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden, residual):
        return residual + self.dense(params["dense"], hidden)


class _EsmIntermediate(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.intermediate_size, True,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, x):
        return gelu_exact(self.dense(params["dense"], x))


class _EsmOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.intermediate_size, config.hidden_size, True,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden, residual):
        return residual + self.dense(params["dense"], hidden)


class EsmLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = EsmAttention(config, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.intermediate = _EsmIntermediate(config, **kw)
        self.output = _EsmOutput(config, **kw)

    def __call__(self, params, hidden, kv_valid):
        hidden = self.attention(params["attention"], hidden, kv_valid)
        h = self.LayerNorm(params["LayerNorm"], hidden)
        h = self.intermediate(params["intermediate"], h)
        return self.output(params["output"], h, hidden)


class EsmEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **kw)
        self.absolute = config.position_embedding_type == "absolute"
        if self.absolute:
            self.position_embeddings = Embedding(config.max_position_embeddings,
                                                 config.hidden_size, **kw)
        if config.emb_layer_norm_before:
            self.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                        dtype=dtype, param_dtype=param_dtype)
        else:
            self.layer_norm = None
        self.padding_idx = config.pad_token_id or 0
        self.mask_token_id = config.mask_token_id
        self.token_dropout = config.token_dropout

    def __call__(self, params, input_ids, attention_mask=None):
        embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        if self.token_dropout:
            is_mask = (input_ids == self.mask_token_id)
            embeds = jnp.where(is_mask[..., None], 0.0, embeds)
            mask_ratio_train = 0.15 * 0.8
            if attention_mask is not None:
                src_len = attention_mask.sum(-1)
            else:
                src_len = jnp.full((input_ids.shape[0],), input_ids.shape[1])
            observed = is_mask.sum(-1).astype(jnp.float32) / src_len.astype(jnp.float32)
            embeds = embeds * ((1 - mask_ratio_train) / (1 - observed))[:, None, None]
        if self.absolute:
            mask = (input_ids != self.padding_idx).astype(jnp.int32)
            pos = jnp.cumsum(mask, axis=1) * mask + self.padding_idx
            embeds = embeds + self.position_embeddings(params["position_embeddings"], pos)
        if self.layer_norm is not None:
            embeds = self.layer_norm(params["layer_norm"], embeds)
        if attention_mask is not None:
            embeds = embeds * attention_mask[..., None].astype(embeds.dtype)
        return embeds


class EsmModel(Module):
    def __init__(self, config: EsmConfig, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = EsmEmbeddings(config, **kw)
        self.encoder = _EsmEncoder(config, **kw)
        if add_pooling_layer:
            from ..bert.modeling_bert import BertPooler

            self.pooler = BertPooler(config, **kw)
        else:
            self.pooler = None
        # contact head (attention-based contact prediction; weights retained)
        self.contact_head = _EsmContactHead(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 output_hidden_states=False, **kwargs) -> BaseModelOutputWithPooling:
        b, s = input_ids.shape
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        # reference EsmModel.forward calls embeddings WITHOUT the mask (the
        # token-dropout rescale then uses full seq_len)
        hidden = self.embeddings(params["embeddings"], input_ids, None)
        hidden, all_hidden = self.encoder(params["encoder"], hidden, kv_valid,
                                          output_hidden_states)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class _EsmContactHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        in_features = config.num_hidden_layers * config.num_attention_heads
        self.regression = Linear(in_features, 1, True, dtype=dtype, param_dtype=param_dtype)


class _EsmEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layer = [EsmLayer(config, **kw) for _ in range(config.num_hidden_layers)]
        self.emb_layer_norm_after = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, kv_valid, output_hidden_states=False):
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layer):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["layer"][str(i)], hidden, kv_valid)
        hidden = self.emb_layer_norm_after(params["emb_layer_norm_after"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class EsmPreTrainedModel(PreTrainedModel):
    config_class = EsmConfig
    base_model_prefix = "esm"


class EsmModelStandalone(EsmPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.esm = EsmModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.esm(params["esm"], *args, **kwargs)


class EsmLMHead(Module):
    """dense -> gelu -> layer_norm -> decoder (tied to word embeddings) + bias
    (reference EsmLMHead)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.dense = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                    dtype=dtype, param_dtype=param_dtype)
        self.vocab_size = config.vocab_size

    def init(self, rng):
        params = super().init(rng)
        params["bias"] = jnp.zeros((self.vocab_size,), self.param_dtype)
        return params

    def __call__(self, params, hidden, table):
        h = gelu_exact(self.dense(params["dense"], hidden))
        h = self.layer_norm(params["layer_norm"], h)
        logits = jnp.dot(h.astype(self.dtype), table.astype(self.dtype).T)
        return logits + params["bias"].astype(self.dtype)


class EsmForMaskedLM(EsmPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"lm_head\.decoder\.", r"\.position_ids$",
                                          r"rotary_embeddings\.inv_freq$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.esm = EsmModel(config, dtype=self.dtype, param_dtype=self.param_dtype,
                            add_pooling_layer=False)
        self.lm_head = EsmLMHead(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "esm.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def __call__(self, params, input_ids=None, attention_mask=None, labels=None,
                 output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        outputs = self.esm(params["esm"], input_ids, attention_mask,
                           output_hidden_states)
        table = params["esm"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.lm_head(params["lm_head"], outputs.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)
