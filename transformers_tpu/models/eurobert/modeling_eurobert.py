"""EuroBERT (reference src/transformers/models/eurobert/modular_eurobert.py).

A BIDIRECTIONAL Llama stack (attention is_causal=False, reference :89) used
as an encoder, with a masked-LM head tied to the embeddings and a
bos/mean/late-pooling sequence classifier (:248)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear
from ...modeling_outputs import MaskedLMOutput, SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ..llama.modeling_llama import LlamaModel, LlamaPreTrainedModel
from .configuration_eurobert import EuroBertConfig


class EuroBertModel(LlamaModel):
    causal_attention = False  # full bidirectional over valid tokens


class EuroBertPreTrainedModel(LlamaPreTrainedModel):
    config_class = EuroBertConfig


class EuroBertModelStandalone(EuroBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = EuroBertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "model.embed_tokens.weight"

    def __call__(self, params, *args, **kwargs):
        return self.model(params["model"], *args, **kwargs)


class EuroBertForMaskedLM(EuroBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = EuroBertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        # untied by default (config.tie_word_embeddings=False gates the
        # reference's _tied_weights_keys); mlp_bias controls the head bias
        self.lm_head = Linear(config.hidden_size, config.vocab_size,
                              use_bias=getattr(config, "mlp_bias", False),
                              dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "model.embed_tokens.weight"

    def __call__(self, params, input_ids=None, attention_mask=None,
                 position_ids=None, labels=None, **kwargs):
        out = self.model(params["model"], input_ids, attention_mask, position_ids)
        if self.config.tie_word_embeddings:
            logits = self.model.embed_tokens.attend(
                params["model"]["embed_tokens"], out.last_hidden_state)
        else:
            logits = self.lm_head(params["lm_head"], out.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits)


class EuroBertForSequenceClassification(EuroBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = EuroBertModel(config, **kw)
        self.dense = Linear(config.hidden_size, config.hidden_size, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 position_ids=None, labels=None, **kwargs):
        out = self.model(params["model"], input_ids, attention_mask, position_ids)
        h = out.last_hidden_state
        pooling = self.config.classifier_pooling
        if pooling in ("bos", "mean"):
            if pooling == "bos":
                pooled = h[:, 0]
            else:
                if attention_mask is None:
                    pooled = jnp.mean(h, axis=1)
                else:
                    m = attention_mask.astype(h.dtype)[..., None]
                    pooled = jnp.sum(h * m, axis=1) / jnp.sum(m, axis=1)
            pooled = jax.nn.gelu(self.dense(params["dense"], pooled), approximate=False)
            logits = self.classifier(params["classifier"], pooled)
        else:  # "late": classify every token then mean over valid positions
            x = jax.nn.gelu(self.dense(params["dense"], h), approximate=False)
            logits = self.classifier(params["classifier"], x)
            if attention_mask is None:
                logits = jnp.mean(logits, axis=1)
            else:
                m = attention_mask.astype(logits.dtype)[..., None]
                logits = jnp.sum(logits * m, axis=1) / jnp.sum(m, axis=1)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)
