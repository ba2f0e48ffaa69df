"""I-BERT (reference models/ibert/modeling_ibert.py).

Integer-only BERT. In ``quant_mode=False`` (the hub default and the only
mode with float semantics) every Quant* module reduces to its float parent
(`quant_modules.py` QuantLinear/QuantEmbedding/IntLayerNorm forward in
float when quant_mode is off), so the architecture is exactly RoBERTa with
pad-offset positions under the ``ibert`` prefix. Quantization range buffers
(`x_min`/`x_max`/scaling factors) appearing in checkpoints are ignored on
load. TPU quantized inference is served by the framework-wide int8 path
(`quantizers/`), not per-model fake-quant re-implementation.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...modeling_outputs import MaskedLMOutput, QuestionAnsweringModelOutput
from ...modeling_utils import PreTrainedModel
from ..roberta.configuration_roberta import RobertaConfig
from ..roberta.modeling_roberta import (
    RobertaClassificationHead,
    RobertaLMHead,
    RobertaModel,
)

_QUANT_BUFFERS = (r"x_min$", r"x_max$", r"scaling_factor$", r"\.position_ids$",
                  r"weight_integer$", r"bias_integer$", r"shift$")


class IBertConfig(RobertaConfig):
    model_type = "ibert"

    def __init__(self, vocab_size=30522, quant_mode=False, force_dequant="none", **kwargs):
        kwargs.setdefault("layer_norm_eps", 1e-12)
        kwargs.setdefault("pad_token_id", 1)
        self.quant_mode = quant_mode
        self.force_dequant = force_dequant
        super().__init__(vocab_size=vocab_size, **kwargs)


class IBertPreTrainedModel(PreTrainedModel):
    config_class = IBertConfig
    base_model_prefix = "ibert"
    _keys_to_ignore_on_load_unexpected = _QUANT_BUFFERS


class IBertModel(RobertaModel):
    pass


class IBertModelStandalone(IBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.ibert = IBertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.ibert(params["ibert"], *args, **kwargs)


class IBertForMaskedLM(IBertPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = _QUANT_BUFFERS + (r"lm_head\.decoder\.",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.ibert = IBertModel(config, add_pooling_layer=False, **kw)
        self.lm_head = RobertaLMHead(config, **kw)

    def get_input_embedding_path(self):
        return "ibert.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None,
                 output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        outputs = self.ibert(params["ibert"], input_ids, attention_mask, token_type_ids,
                             position_ids, inputs_embeds, output_hidden_states)
        table = params["ibert"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.lm_head(params["lm_head"], outputs.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)


class IBertForSequenceClassification(IBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.num_labels = config.num_labels
        self.ibert = IBertModel(config, add_pooling_layer=False, **kw)
        self.classifier = RobertaClassificationHead(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None, **kwargs):
        outputs = self.ibert(params["ibert"], input_ids, attention_mask, token_type_ids,
                             position_ids, inputs_embeds)
        logits = self.classifier(params["classifier"], outputs.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        from ...modeling_outputs import SequenceClassifierOutput

        return SequenceClassifierOutput(loss=loss, logits=logits,
                                        hidden_states=outputs.hidden_states)


class IBertForQuestionAnswering(IBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.ibert = IBertModel(config, add_pooling_layer=False, **kw)
        self.qa_outputs = Linear(config.hidden_size, 2, True,
                                 kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, start_positions=None,
                 end_positions=None, **kwargs) -> QuestionAnsweringModelOutput:
        outputs = self.ibert(params["ibert"], input_ids, attention_mask, token_type_ids,
                             position_ids, inputs_embeds)
        logits = self.qa_outputs(params["qa_outputs"], outputs.last_hidden_state)
        start_logits, end_logits = logits[..., 0], logits[..., 1]
        loss = None
        if start_positions is not None and end_positions is not None:
            from ...loss import for_question_answering_loss

            loss = for_question_answering_loss(start_logits, end_logits,
                                               start_positions, end_positions)
        return QuestionAnsweringModelOutput(loss=loss, start_logits=start_logits,
                                            end_logits=end_logits,
                                            hidden_states=outputs.hidden_states)
