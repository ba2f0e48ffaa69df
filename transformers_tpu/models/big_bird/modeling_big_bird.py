"""BigBird (reference src/transformers/models/big_bird/modeling_big_bird.py).

BERT-style encoder for long documents. The reference's ``block_sparse``
attention (global + sliding + RANDOM blocks) is a GPU memory optimization
that *approximates* full attention and auto-falls back to ``original_full``
for short sequences; on TPU we always run exact full attention — a strict
superset of the sparse pattern (same weights, the quality north star), with
the pallas flash kernel handling long sequences blockwise. Quirks kept:
embeddings LayerNorm applied AFTER the (inference no-op) dropout, optional
sqrt(d) embedding rescale, plain Linear+tanh ``pooler``, query/key/value with
``use_bias``. Checkpoint prefix ``bert``."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, MaskedLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.attention import get_attention_fn
from ..bert.modeling_bert import (
    BertEmbeddings,
    BertEncoder,
    BertIntermediate,
    BertLayer,
    BertOutput,
    BertSelfAttention,
    BertSelfOutput,
    _BertOnlyMLMHead,
)
from .configuration_big_bird import BigBirdConfig


class BigBirdEmbeddings(BertEmbeddings):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.rescale = config.rescale_embeddings
        self.hidden_size = config.hidden_size

    def __call__(self, params, input_ids, token_type_ids=None, position_ids=None,
                 inputs_embeds=None):
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        if self.rescale:
            inputs_embeds = inputs_embeds * (self.hidden_size**0.5)
        if position_ids is None:
            position_ids = self.position_ids(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros(inputs_embeds.shape[:2], jnp.int32)
        h = (inputs_embeds
             + self.position_embeddings(params["position_embeddings"], position_ids)
             + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids))
        # reference quirk: dropout BEFORE LayerNorm (no-op at inference)
        return self.LayerNorm(params["LayerNorm"], h)


class BigBirdSelfAttention(BertSelfAttention):
    def __init__(self, config, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        bias = config.use_bias
        self.query = Linear(config.hidden_size, config.hidden_size, bias, **kw)
        self.key = Linear(config.hidden_size, config.hidden_size, bias, **kw)
        self.value = Linear(config.hidden_size, config.hidden_size, bias, **kw)


class BigBirdLayer(BertLayer):
    def __init__(self, config, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = _BigBirdAttention(config, **kw)
        self.intermediate = BertIntermediate(config, **kw)
        self.output = BertOutput(config, **kw)


class _BigBirdAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.self = BigBirdSelfAttention(config, dtype=dtype, param_dtype=param_dtype)
        self.output = BertSelfOutput(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, attn_args):
        out = self.self(params["self"], hidden, attn_args)
        return self.output(params["output"], out, hidden)


class BigBirdEncoder(BertEncoder):
    layer_cls = BigBirdLayer


class BigBirdModel(Module):
    def __init__(self, config, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = BigBirdEmbeddings(config, **kw)
        self.encoder = BigBirdEncoder(config, **kw)
        if add_pooling_layer:
            self.pooler = Linear(config.hidden_size, config.hidden_size, True, dtype=dtype,
                                 param_dtype=param_dtype,
                                 kernel_init=normal_init(config.initializer_range))
        else:
            self.pooler = None

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, output_hidden_states=False,
                 **kwargs) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, token_type_ids,
                                 position_ids, inputs_embeds)
        b, s, _ = hidden.shape
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        hidden, all_hidden = self.encoder(params["encoder"], hidden, attn_args,
                                          output_hidden_states)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = jnp.tanh(self.pooler(params["pooler"], hidden[:, 0]))
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class BigBirdPreTrainedModel(PreTrainedModel):
    config_class = BigBirdConfig
    base_model_prefix = "bert"


class BigBirdModelStandalone(BigBirdPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.bert = BigBirdModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.bert(params["bert"], *args, **kwargs)


class BigBirdForMaskedLM(BigBirdPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"cls\.predictions\.decoder\.", r"\.position_ids$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        # reference BigBirdForMaskedLM keeps the pooler
        self.bert = BigBirdModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.cls = _BertOnlyMLMHead(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "bert.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None,
                 output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        outputs = self.bert(params["bert"], input_ids, attention_mask, token_type_ids,
                            position_ids, inputs_embeds, output_hidden_states)
        table = params["bert"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls(params["cls"], outputs.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)
