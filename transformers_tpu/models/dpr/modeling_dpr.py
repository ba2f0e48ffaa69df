"""DPR (reference models/dpr/modeling_dpr.py).

Dense Passage Retrieval bi-encoders: question / context towers are plain
BERT stacks whose representation is the [CLS] hidden state (:160, not the
tanh pooler) with an optional projection; the reader scores spans with
qa_outputs + a relevance qa_classifier over the [CLS].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ..bert.modeling_bert import BertModel


class DPRConfig(PretrainedConfig):
    model_type = "dpr"

    def __init__(self, vocab_size=30522, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=512, type_vocab_size=2,
                 initializer_range=0.02, layer_norm_eps=1e-12, pad_token_id=0,
                 position_embedding_type="absolute", projection_dim=0, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.position_embedding_type = position_embedding_type
        self.projection_dim = projection_dim
        super().__init__(pad_token_id=pad_token_id, **kwargs)


@dataclass
class DPREncoderOutput(ModelOutput):
    pooler_output: Optional[jnp.ndarray] = None
    hidden_states: Optional[tuple] = None


@dataclass
class DPRReaderOutput(ModelOutput):
    start_logits: Optional[jnp.ndarray] = None
    end_logits: Optional[jnp.ndarray] = None
    relevance_logits: Optional[jnp.ndarray] = None


class DPREncoder(Module):
    """reference :125 — bert (no pooler) + CLS + optional projection."""

    def __init__(self, config: DPRConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.bert_model = BertModel(config, dtype=dtype, param_dtype=param_dtype,
                                    add_pooling_layer=False)
        if config.projection_dim > 0:
            self.encode_proj = Linear(config.hidden_size, config.projection_dim, True,
                                      dtype=dtype, param_dtype=param_dtype,
                                      kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, inputs_embeds=None, output_hidden_states=False):
        out = self.bert_model(params["bert_model"], input_ids, attention_mask,
                              token_type_ids, None, inputs_embeds, output_hidden_states)
        pooled = out.last_hidden_state[:, 0]
        if self.config.projection_dim > 0:
            pooled = self.encode_proj(params["encode_proj"], pooled)
        return out.last_hidden_state, pooled, out.hidden_states


class DPRPreTrainedModel(PreTrainedModel):
    config_class = DPRConfig


class DPRQuestionEncoder(DPRPreTrainedModel):
    base_model_prefix = "question_encoder"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.question_encoder = DPREncoder(config, dtype=self.dtype,
                                           param_dtype=self.param_dtype)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, inputs_embeds=None,
                 output_hidden_states=False, **kwargs) -> DPREncoderOutput:
        _, pooled, hs = self.question_encoder(params["question_encoder"], input_ids,
                                              attention_mask, token_type_ids,
                                              inputs_embeds, output_hidden_states)
        return DPREncoderOutput(pooler_output=pooled, hidden_states=hs)


class DPRContextEncoder(DPRPreTrainedModel):
    base_model_prefix = "ctx_encoder"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.ctx_encoder = DPREncoder(config, dtype=self.dtype,
                                      param_dtype=self.param_dtype)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, inputs_embeds=None,
                 output_hidden_states=False, **kwargs) -> DPREncoderOutput:
        _, pooled, hs = self.ctx_encoder(params["ctx_encoder"], input_ids,
                                         attention_mask, token_type_ids,
                                         inputs_embeds, output_hidden_states)
        return DPREncoderOutput(pooler_output=pooled, hidden_states=hs)


class DPRReader(DPRPreTrainedModel):
    base_model_prefix = "span_predictor"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        span = Module(dtype=self.dtype, param_dtype=self.param_dtype)
        span.encoder = DPREncoder(config, dtype=self.dtype, param_dtype=self.param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        span.qa_outputs = Linear(config.hidden_size, 2, True, **kw)
        span.qa_classifier = Linear(config.hidden_size, 1, True, **kw)
        self.span_predictor = span

    def __call__(self, params, input_ids=None, attention_mask=None,
                 inputs_embeds=None, output_hidden_states=False,
                 **kwargs) -> DPRReaderOutput:
        sp = params["span_predictor"]
        seq, _, _ = self.span_predictor.encoder(sp["encoder"], input_ids,
                                                attention_mask, None, inputs_embeds,
                                                output_hidden_states)
        logits = self.span_predictor.qa_outputs(sp["qa_outputs"], seq)
        start, end = logits[..., 0], logits[..., 1]
        relevance = self.span_predictor.qa_classifier(sp["qa_classifier"], seq[:, 0])
        return DPRReaderOutput(start_logits=start, end_logits=end,
                               relevance_logits=relevance[:, 0])
