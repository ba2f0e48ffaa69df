"""MPNet (reference models/mpnet/modeling_mpnet.py): BERT-style encoder with
padding-offset position embeddings (padding_idx=1) and T5-style relative
position bias shared across layers (:319/:363)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import PretrainedConfig
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, MaskedLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..bert.modeling_bert import BertPooler


class MPNetConfig(PretrainedConfig):
    model_type = "mpnet"

    def __init__(self, vocab_size=30527, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=514, initializer_range=0.02,
                 layer_norm_eps=1e-12, relative_attention_num_buckets=32,
                 pad_token_id=1, bos_token_id=0, eos_token_id=2, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.relative_attention_num_buckets = relative_attention_num_buckets
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)


def relative_position_bucket(rel, num_buckets=32, max_distance=128):
    ret = jnp.zeros_like(rel)
    n = -rel
    num_buckets //= 2
    ret = ret + (n < 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class MPNetSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.q = Linear(h, h, True, **kw)
        self.k = Linear(h, h, True, **kw)
        self.v = Linear(h, h, True, **kw)
        self.o = Linear(h, h, True, **kw)

    def __call__(self, params, hidden, position_bias, pad_bias):
        b, s, e = hidden.shape
        q = self.q(params["q"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k(params["k"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v(params["v"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        w = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.head_dim)
        w = w + position_bias
        if pad_bias is not None:
            w = w + pad_bias
        probs = jax.nn.softmax(w, axis=-1)
        c = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, e)
        return self.o(params["o"], c)


class MPNetLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        kw2 = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        attention = Module(**kw)
        attention.attn = MPNetSelfAttention(config, **kw)
        attention.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.attention = attention
        inter = Module(**kw)
        inter.dense = Linear(config.hidden_size, config.intermediate_size, True, **kw2)
        self.intermediate = inter
        out = Module(**kw)
        out.dense = Linear(config.intermediate_size, config.hidden_size, True, **kw2)
        out.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.output = out
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, position_bias, pad_bias):
        a = self.attention.attn(params["attention"]["attn"], hidden,
                                position_bias, pad_bias)
        hidden = self.attention.LayerNorm(params["attention"]["LayerNorm"], a + hidden)
        inner = self.act(self.intermediate.dense(params["intermediate"]["dense"], hidden))
        o = self.output.dense(params["output"]["dense"], inner)
        return self.output.LayerNorm(params["output"]["LayerNorm"], o + hidden)


class MPNetPreTrainedModel(PreTrainedModel):
    config_class = MPNetConfig
    base_model_prefix = "mpnet"


class MPNetModel(Module):
    def __init__(self, config, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ekw = dict(dtype=dtype, param_dtype=param_dtype,
                   embedding_init=normal_init(config.initializer_range))
        embeddings = Module(**kw)
        embeddings.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **ekw)
        embeddings.position_embeddings = Embedding(config.max_position_embeddings,
                                                   config.hidden_size, **ekw)
        embeddings.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.embeddings = embeddings
        encoder = Module(**kw)
        encoder.layer = [MPNetLayer(config, **kw)
                         for _ in range(config.num_hidden_layers)]
        encoder.relative_attention_bias = Embedding(
            config.relative_attention_num_buckets, config.num_attention_heads, **ekw)
        self.encoder = encoder
        self.pooler = BertPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, input_ids=None, attention_mask=None,
                 position_ids=None, inputs_embeds=None,
                 output_hidden_states=False, **kwargs):
        pad = 1
        if position_ids is None and input_ids is not None:
            mask = (input_ids != pad).astype(jnp.int32)
            position_ids = jnp.cumsum(mask, axis=1) * mask + pad
        emb = params["embeddings"]
        if inputs_embeds is None:
            inputs_embeds = self.embeddings.word_embeddings(
                emb["word_embeddings"], input_ids)
        h = inputs_embeds + self.embeddings.position_embeddings(
            emb["position_embeddings"], position_ids)
        h = self.embeddings.LayerNorm(emb["LayerNorm"], h)
        b, s, _ = h.shape

        rel = (jnp.arange(s)[None, :] - jnp.arange(s)[:, None])
        buckets = relative_position_bucket(
            rel, self.config.relative_attention_num_buckets)
        bias_table = self.encoder.relative_attention_bias(
            params["encoder"]["relative_attention_bias"], buckets)  # [S, S, H]
        position_bias = bias_table.transpose(2, 0, 1)[None]  # [1, H, S, S]

        pad_bias = None
        if attention_mask is not None:
            pad_bias = ((1.0 - attention_mask[:, None, None, :].astype(jnp.float32))
                        * jnp.finfo(jnp.float32).min)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layer):
            if output_hidden_states:
                all_hidden.append(h)
            h = layer(params["encoder"]["layer"][str(i)], h, position_bias, pad_bias)
        if output_hidden_states:
            all_hidden.append(h)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], h)
        return BaseModelOutputWithPooling(
            last_hidden_state=h, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class MPNetModelStandalone(MPNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.mpnet = MPNetModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.mpnet(params["mpnet"], *args, **kwargs)


class MPNetForMaskedLM(MPNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.mpnet = MPNetModel(config, add_pooling_layer=False, **kw)
        from ..roberta.modeling_roberta import RobertaLMHead

        self.lm_head = RobertaLMHead(config, **kw)

    def get_input_embedding_path(self):
        return "mpnet.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None,
                 position_ids=None, inputs_embeds=None, labels=None,
                 output_hidden_states=False, **kwargs):
        outputs = self.mpnet(params["mpnet"], input_ids, attention_mask,
                             position_ids, inputs_embeds, output_hidden_states)
        table = params["mpnet"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.lm_head(params["lm_head"], outputs.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits,
                              hidden_states=outputs.hidden_states)
