"""RemBERT (reference src/transformers/models/rembert/modeling_rembert.py).

BERT skeleton with decoupled embeddings: small ``input_embedding_size``
word/position/token-type embeddings projected up by
``encoder.embedding_hidden_mapping_in``, and an UNTIED MLM head
``cls.predictions.{dense → output_embedding_size, LayerNorm, decoder}``."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import MaskedLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..bert.modeling_bert import BertEmbeddings, BertEncoder, BertModel
from .configuration_rembert import RemBertConfig


class RemBertEmbeddings(BertEmbeddings):
    def __init__(self, config, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        d = config.input_embedding_size
        self.word_embeddings = Embedding(config.vocab_size, d, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings, d, **kw)
        self.token_type_embeddings = Embedding(config.type_vocab_size, d, **kw)
        self.LayerNorm = LayerNorm(d, config.layer_norm_eps, dtype=dtype, param_dtype=param_dtype)
        self.pad_token_id = config.pad_token_id


class RemBertEncoder(BertEncoder):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.embedding_hidden_mapping_in = Linear(
            config.input_embedding_size, config.hidden_size, True, dtype=dtype,
            param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden, attn_args, output_hidden_states=False):
        hidden = self.embedding_hidden_mapping_in(
            params["embedding_hidden_mapping_in"], hidden)
        return super().__call__(params, hidden, attn_args, output_hidden_states)


class RemBertModel(BertModel):
    embeddings_cls = RemBertEmbeddings
    encoder_cls = RemBertEncoder


class RemBertPreTrainedModel(PreTrainedModel):
    config_class = RemBertConfig
    base_model_prefix = "rembert"


class RemBertModelStandalone(RemBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.rembert = RemBertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.rembert(params["rembert"], *args, **kwargs)


class RemBertLMPredictionHead(Module):
    """dense(hidden → output_embedding_size) → act → LayerNorm → decoder
    (untied, reference RemBertLMPredictionHead)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.dense = Linear(config.hidden_size, config.output_embedding_size, True, **kw)
        self.LayerNorm = LayerNorm(config.output_embedding_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)
        self.decoder = Linear(config.output_embedding_size, config.vocab_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        h = self.act(self.dense(params["dense"], hidden))
        h = self.LayerNorm(params["LayerNorm"], h)
        return self.decoder(params["decoder"], h)


class _RemBertMLMHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.predictions = RemBertLMPredictionHead(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden):
        return self.predictions(params["predictions"], hidden)


class RemBertForMaskedLM(RemBertPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.rembert = RemBertModel(config, dtype=self.dtype, param_dtype=self.param_dtype,
                                    add_pooling_layer=False)
        self.cls = _RemBertMLMHead(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "rembert.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None,
                 output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        outputs = self.rembert(params["rembert"], input_ids, attention_mask, token_type_ids,
                               position_ids, inputs_embeds, output_hidden_states)
        logits = self.cls(params["cls"], outputs.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)
