"""Splinter (reference models/splinter/modeling_splinter.py).

BERT encoder (prefix ``splinter``) + the Question-Aware Span Selection head
(:523): representations gathered at [QUESTION] token positions are
transformed and matched against start/end-transformed context tokens via
bilinear classifiers.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ModelOutput, QuestionAnsweringModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..bert.modeling_bert import BertModel


class SplinterConfig(PretrainedConfig):
    model_type = "splinter"

    def __init__(self, vocab_size=30522, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=512, type_vocab_size=2,
                 initializer_range=0.02, layer_norm_eps=1e-12, use_cache=True,
                 pad_token_id=0, question_token_id=104, **kwargs):
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
        self.use_cache = use_cache
        self.question_token_id = question_token_id
        super().__init__(pad_token_id=pad_token_id, **kwargs)


class SplinterPreTrainedModel(PreTrainedModel):
    config_class = SplinterConfig
    base_model_prefix = "splinter"


class SplinterModel(BertModel):
    """BERT encoder without pooler (reference :387)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype,
                         add_pooling_layer=False)


class SplinterModelStandalone(SplinterPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.splinter = SplinterModel(config, dtype=self.dtype,
                                      param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.splinter(params["splinter"], *args, **kwargs)


class SplinterFullyConnectedLayer(Module):
    def __init__(self, input_dim, output_dim, hidden_act="gelu", *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.dense = Linear(input_dim, output_dim, True, **kw)
        self.LayerNorm = LayerNorm(output_dim, 1e-5, dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(hidden_act)

    def __call__(self, params, x):
        return self.LayerNorm(params["LayerNorm"],
                              self.act(self.dense(params["dense"], x)))


class QuestionAwareSpanSelectionHead(Module):
    """reference :523."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        self.query_start_transform = SplinterFullyConnectedLayer(h, h, **kw)
        self.query_end_transform = SplinterFullyConnectedLayer(h, h, **kw)
        self.start_transform = SplinterFullyConnectedLayer(h, h, **kw)
        self.end_transform = SplinterFullyConnectedLayer(h, h, **kw)
        kw2 = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.start_classifier = Linear(h, h, False, **kw2)
        self.end_classifier = Linear(h, h, False, **kw2)

    def __call__(self, params, inputs, positions):
        gathered = jnp.take_along_axis(inputs, positions[..., None], axis=1)
        q_start = self.query_start_transform(params["query_start_transform"], gathered)
        q_end = self.query_end_transform(params["query_end_transform"], gathered)
        starts = self.start_transform(params["start_transform"], inputs)
        ends = self.end_transform(params["end_transform"], inputs)
        start_logits = jnp.einsum(
            "bqh,bsh->bqs", self.start_classifier(params["start_classifier"], q_start), starts)
        end_logits = jnp.einsum(
            "bqh,bsh->bqs", self.end_classifier(params["end_classifier"], q_end), ends)
        return start_logits, end_logits


class SplinterForQuestionAnswering(SplinterPreTrainedModel):
    """reference :562 — one [QUESTION] token per example."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.splinter = SplinterModel(config, **kw)
        self.splinter_qass = QuestionAwareSpanSelectionHead(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 question_positions=None, output_hidden_states=False,
                 **kwargs) -> QuestionAnsweringModelOutput:
        outputs = self.splinter(params["splinter"], input_ids, attention_mask,
                                token_type_ids, position_ids, inputs_embeds,
                                output_hidden_states)
        if question_positions is None:
            is_q = (input_ids == self.config.question_token_id).astype(jnp.int32)
            question_positions = jnp.argmax(is_q, axis=-1)[:, None]
        start, end = self.splinter_qass(params["splinter_qass"],
                                        outputs.last_hidden_state, question_positions)
        if question_positions.shape[1] == 1:
            start, end = start[:, 0], end[:, 0]
        if attention_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            start = jnp.where(attention_mask == 0, neg, start)
            end = jnp.where(attention_mask == 0, neg, end)
        return QuestionAnsweringModelOutput(start_logits=start, end_logits=end,
                                            hidden_states=outputs.hidden_states)
