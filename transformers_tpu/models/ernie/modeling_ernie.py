"""ERNIE 1.0-3.0 (reference src/transformers/models/ernie/modeling_ernie.py).

BERT skeleton plus optional task-type embeddings (``use_task_id``), prefix
``ernie.*``."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Embedding, normal_init
from ...modeling_outputs import MaskedLMOutput
from ...modeling_utils import PreTrainedModel
from ..bert.modeling_bert import BertEmbeddings, BertModel, _BertOnlyMLMHead
from .configuration_ernie import ErnieConfig


class ErnieEmbeddings(BertEmbeddings):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.use_task_id = config.use_task_id
        if config.use_task_id:
            self.task_type_embeddings = Embedding(
                config.task_type_vocab_size, config.hidden_size, dtype=dtype,
                param_dtype=param_dtype,
                embedding_init=normal_init(config.initializer_range))

    def __call__(self, params, input_ids, token_type_ids=None, position_ids=None,
                 inputs_embeds=None, task_type_ids=None):
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        if position_ids is None:
            position_ids = self.position_ids(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros(inputs_embeds.shape[:2], jnp.int32)
        h = (inputs_embeds
             + self.position_embeddings(params["position_embeddings"], position_ids)
             + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids))
        if self.use_task_id:
            if task_type_ids is None:
                task_type_ids = jnp.zeros(inputs_embeds.shape[:2], jnp.int32)
            h = h + self.task_type_embeddings(params["task_type_embeddings"], task_type_ids)
        return self.LayerNorm(params["LayerNorm"], h)


class ErnieModel(BertModel):
    embeddings_cls = ErnieEmbeddings


class ErniePreTrainedModel(PreTrainedModel):
    config_class = ErnieConfig
    base_model_prefix = "ernie"


class ErnieModelStandalone(ErniePreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.ernie = ErnieModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.ernie(params["ernie"], *args, **kwargs)


class ErnieForMaskedLM(ErniePreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"cls\.predictions\.decoder\.", r"\.position_ids$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.ernie = ErnieModel(config, dtype=self.dtype, param_dtype=self.param_dtype,
                                add_pooling_layer=False)
        self.cls = _BertOnlyMLMHead(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "ernie.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None,
                 output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        outputs = self.ernie(params["ernie"], input_ids, attention_mask, token_type_ids,
                             position_ids, inputs_embeds, output_hidden_states)
        table = params["ernie"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls(params["cls"], outputs.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)
