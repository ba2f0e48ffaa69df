"""TAPAS, TPU-native (reference src/transformers/models/tapas/modeling_tapas.py).

BERT trunk for table QA: embeddings sum SEVEN token-type embeddings encoding
table structure (segment/column/row/prev-label/ranks/numeric-relation), with
optional per-cell position resets via segmented-min
(reference TapasEmbeddings, modeling_tapas.py:67). The QA head scores tokens
(cell selection) and columns (segmented mean over cells then columns,
reference compute_column_logits, modeling_tapas.py:1598), plus an aggregation
classifier over the pooled state.

TPU framing: segment reductions over cells use `jax.ops.segment_*` with
STATIC segment counts (max_num_rows x max_num_columns), and the cell->column
reduction is a constant one-hot matmul — no dynamic shapes anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (MaskedLMOutput, SequenceClassifierOutput)
from ...modeling_utils import PreTrainedModel
from ...utils.generic import ModelOutput
from ..bert.modeling_bert import BertModel, _BertOnlyMLMHead
from .configuration_tapas import TapasConfig

EPSILON_ZERO_DIVISION = 1e-10
CLOSE_ENOUGH_TO_LOG_ZERO = -10000.0


@dataclass
class TableQuestionAnsweringOutput(ModelOutput):
    loss: Any = None
    logits: Any = None
    logits_aggregation: Any = None
    hidden_states: Any = None


def _segment_sum(values, indices, num_segments):
    """[B, S] values + [B, S] int indices -> [B, num_segments] per-row sums."""
    return jax.vmap(lambda v, i: jax.ops.segment_sum(v, i, num_segments))(
        values, indices)


def _segment_mean(values, indices, num_segments):
    sums = _segment_sum(values, indices, num_segments)
    counts = _segment_sum(jnp.ones_like(values), indices, num_segments)
    return sums / jnp.maximum(counts, 1.0)


def _segment_min(values, indices, num_segments):
    return jax.vmap(lambda v, i: jax.ops.segment_min(v, i, num_segments))(
        values, indices)


class TapasEmbeddings(Module):
    """Reference modeling_tapas.py:67."""

    def __init__(self, config: TapasConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        self.config = config
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings,
                                             config.hidden_size, **kw)
        for i, n in enumerate(config.type_vocab_sizes):
            setattr(self, f"token_type_embeddings_{i}",
                    Embedding(n, config.hidden_size, **kw))
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_ids, token_type_ids=None, position_ids=None,
                 inputs_embeds=None):
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        b, s = inputs_embeds.shape[:2]
        c = self.config
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s, len(c.type_vocab_sizes)), jnp.int32)
        if position_ids is None:
            base = jnp.arange(s, dtype=jnp.int32)[None, :]
            if c.reset_position_index_per_cell:
                # cell id = col * n_rows + row (reference: ProductIndexMap(col, row))
                n_rows = c.type_vocab_sizes[2]
                cell = (token_type_ids[:, :, 1] * n_rows
                        + token_type_ids[:, :, 2]).astype(jnp.int32)
                n_cells = c.type_vocab_sizes[1] * n_rows
                positions = jnp.broadcast_to(base, (b, s))
                first = _segment_min(positions, cell, n_cells)
                first_per_token = jnp.take_along_axis(first, cell, axis=1)
                position_ids = jnp.minimum(c.max_position_embeddings - 1,
                                           base - first_per_token)
            else:
                position_ids = base
        h = inputs_embeds + self.position_embeddings(
            params["position_embeddings"], position_ids)
        for i in range(len(c.type_vocab_sizes)):
            name = f"token_type_embeddings_{i}"
            h = h + getattr(self, name)(params[name], token_type_ids[:, :, i])
        return self.LayerNorm(params["LayerNorm"], h)


class TapasModel(BertModel):
    embeddings_cls = TapasEmbeddings


class TapasPreTrainedModel(PreTrainedModel):
    config_class = TapasConfig
    base_model_prefix = "tapas"
    _keys_to_ignore_on_load_unexpected = (r"position_ids$",
                                          r"cls\.predictions\.decoder\.")


class TapasModelStandalone(TapasPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.tapas = TapasModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, **kwargs):
        return self.tapas(params["tapas"], input_ids, attention_mask,
                          token_type_ids, position_ids)


class TapasForMaskedLM(TapasPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.tapas = TapasModel(config, add_pooling_layer=False, **kw)
        self.cls = _BertOnlyMLMHead(config, **kw)

    def get_input_embedding_path(self):
        return "tapas.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, labels=None, **kwargs):
        out = self.tapas(params["tapas"], input_ids, attention_mask,
                         token_type_ids, position_ids)
        table = params["tapas"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls(params["cls"], out.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits)


class TapasForSequenceClassification(TapasPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.tapas = TapasModel(config, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, labels=None, **kwargs):
        out = self.tapas(params["tapas"], input_ids, attention_mask,
                         token_type_ids, position_ids)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)


class TapasForQuestionAnswering(TapasPreTrainedModel):
    """Inference path of reference modeling_tapas.py:785 (cell-selection token
    logits + segmented column logits + aggregation logits). The hierarchical
    training losses are not implemented — pass precomputed labels to an
    external objective if fine-tuning."""

    def __init__(self, config: TapasConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.tapas = TapasModel(config, **kw)
        if config.num_aggregation_labels > 0:
            self.aggregation_classifier = Linear(
                config.hidden_size, config.num_aggregation_labels, True, **kw)

    def init(self, rng):
        params = super().init(rng)
        d = self.config.hidden_size
        params["output_weights"] = jnp.zeros((d,), self.param_dtype)
        params["column_output_weights"] = jnp.zeros((d,), self.param_dtype)
        params["output_bias"] = jnp.zeros((), self.param_dtype)
        params["column_output_bias"] = jnp.zeros((), self.param_dtype)
        return params

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, table_mask=None,
                 **kwargs) -> TableQuestionAnsweringOutput:
        c = self.config
        out = self.tapas(params["tapas"], input_ids, attention_mask,
                         token_type_ids, position_ids)
        seq = out.last_hidden_state
        b, s, _ = seq.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s, len(c.type_vocab_sizes)), jnp.int32)
        row_ids = token_type_ids[:, :, 2]
        column_ids = token_type_ids[:, :, 1]
        rows = jnp.minimum(row_ids, c.max_num_rows - 1).astype(jnp.int32)
        cols = jnp.minimum(column_ids, c.max_num_columns - 1).astype(jnp.int32)
        cell = rows * c.max_num_columns + cols
        n_cells = c.max_num_rows * c.max_num_columns

        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        cell_mask = _segment_mean(attention_mask.astype(jnp.float32), cell, n_cells)

        logits = (jnp.einsum("bsd,d->bs", seq,
                             params["output_weights"].astype(seq.dtype))
                  + params["output_bias"].astype(seq.dtype)) / c.temperature

        column_logits = None
        if c.select_one_column:
            tok = (jnp.einsum("bsd,d->bs", seq,
                              params["column_output_weights"].astype(seq.dtype))
                   + params["column_output_bias"].astype(seq.dtype))
            cell_logits = _segment_mean(tok, cell, n_cells)
            # cell -> column: constant one-hot matmul (static shapes)
            col_of_cell = np.arange(n_cells) % c.max_num_columns
            onehot = jnp.asarray(np.eye(c.max_num_columns)[col_of_cell],
                                 cell_logits.dtype)
            column_logits = jnp.einsum("bn,nc->bc", cell_logits * cell_mask, onehot)
            cell_count = jnp.einsum("bn,nc->bc", cell_mask, onehot)
            column_logits = column_logits / (cell_count + EPSILON_ZERO_DIVISION)
            col_idx = jnp.arange(c.max_num_columns)
            is_padding = (cell_count < 0.5) & (col_idx[None, :] != 0)
            column_logits = column_logits + CLOSE_ENOUGH_TO_LOG_ZERO * is_padding
            if not c.allow_empty_column_selection:
                column_logits = column_logits + CLOSE_ENOUGH_TO_LOG_ZERO * (
                    col_idx[None, :] == 0)
            # Constrain token logits to the model-selected column (reference
            # _single_column_cell_selection_loss tail, modeling_tapas.py:1736):
            # per-token logits become per-cell means, and all cells outside
            # the argmax column (or in column 0 / padding) are forced to ~-inf.
            logits_per_cell = _segment_mean(logits, cell, n_cells)
            col_of = jnp.asarray(col_of_cell)[None, :]
            selected = jnp.argmax(column_logits, axis=-1)[:, None]
            sel_mask = ((col_of == selected) & (col_of != 0)).astype(logits.dtype)
            new_cell = logits_per_cell + CLOSE_ENOUGH_TO_LOG_ZERO * (
                1.0 - cell_mask * sel_mask)
            logits = jnp.take_along_axis(new_cell, cell, axis=1)

        logits_aggregation = None
        if c.num_aggregation_labels > 0:
            logits_aggregation = self.aggregation_classifier(
                params["aggregation_classifier"], out.pooler_output)
        return TableQuestionAnsweringOutput(logits=logits,
                                            logits_aggregation=logits_aggregation)
