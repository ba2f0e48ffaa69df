"""CANINE, TPU-native (reference src/transformers/models/canine/modeling_canine.py).

Tokenization-free character model: codepoints are embedded via 8 hash
functions into sharded tables (reference CanineEmbeddings, :86), a 1-layer
LOCAL char transformer runs block-diagonal attention, strided convolution
downsamples chars->molecules 4x (keeping [CLS] as its own slot), the deep
BERT stack runs on molecules, and a conv projection + 1-layer char
transformer upsamples back to characters.

TPU framing: the reference's chunk-loop local attention is replaced by ONE
dense attention with a block-diagonal additive bias — numerically identical
(equal chunk width == stride), XLA-friendly, no host loop over chunks.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (QuestionAnsweringModelOutput,
                                 SequenceClassifierOutput, TokenClassifierOutput)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from ..bert.modeling_bert import BertEncoder, BertPooler
from .configuration_canine import CanineConfig

_PRIMES = [31, 43, 59, 61, 73, 97, 103, 113, 137, 149, 157, 173, 181, 193, 211, 223]
_MASK_MIN = -3.4e38


@dataclass
class CanineModelOutputWithPooling(ModelOutput):
    last_hidden_state: Any = None
    pooler_output: Any = None
    hidden_states: Any = None


class CanineEmbeddings(Module):
    """Multi-hash codepoint embeddings (reference modeling_canine.py:86)."""

    def __init__(self, config: CanineConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        self.config = config
        shard = config.hidden_size // config.num_hash_functions
        for i in range(config.num_hash_functions):
            setattr(self, f"HashBucketCodepointEmbedder_{i}",
                    Embedding(config.num_hash_buckets, shard, **kw))
        self.char_position_embeddings = Embedding(config.num_hash_buckets,
                                                  config.hidden_size, **kw)
        self.token_type_embeddings = Embedding(config.type_vocab_size,
                                               config.hidden_size, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_ids, token_type_ids=None, position_ids=None):
        c = self.config
        b, s = input_ids.shape
        shards = []
        for i, prime in enumerate(_PRIMES[: c.num_hash_functions]):
            hashed = ((input_ids + 1) * prime) % c.num_hash_buckets
            name = f"HashBucketCodepointEmbedder_{i}"
            shards.append(getattr(self, name)(params[name], hashed))
        h = jnp.concatenate(shards, axis=-1)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :]
        h = h + self.token_type_embeddings(params["token_type_embeddings"],
                                           token_type_ids)
        h = h + self.char_position_embeddings(params["char_position_embeddings"],
                                              position_ids)
        return self.LayerNorm(params["LayerNorm"], h)


class CharactersToMolecules(Module):
    """Strided conv downsample, [CLS] kept as slot 0 (reference :181)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        r = config.downsampling_rate
        self.conv = Conv(config.hidden_size, config.hidden_size, r, stride=r,
                         ndim=1, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, char_encoding):
        cls = char_encoding[:, 0:1]
        down = self.conv(params["conv"], char_encoding.transpose(0, 2, 1))
        down = self.act(down.transpose(0, 2, 1))
        result = jnp.concatenate([cls, down[:, :-1]], axis=1)
        return self.LayerNorm(params["LayerNorm"], result)


class ConvProjection(Module):
    """SAME-padded conv back to hidden_size (reference :225)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.k = config.upsampling_kernel_size
        self.conv = Conv(config.hidden_size * 2, config.hidden_size, self.k,
                         ndim=1, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, inputs):
        x = inputs.transpose(0, 2, 1)
        pad_total = self.k - 1
        x = jnp.pad(x, ((0, 0), (0, 0), (pad_total // 2, pad_total - pad_total // 2)))
        out = self.conv(params["conv"], x).transpose(0, 2, 1)
        return self.LayerNorm(params["LayerNorm"], self.act(out))


def _local_bias(b, s, stride, attention_mask, dtype):
    """Additive bias enforcing block-diagonal chunks of width == stride and
    the padding mask (exactly the reference's chunk loop for width==stride)."""
    blk = jnp.arange(s) // stride
    same = blk[:, None] == blk[None, :]
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    ok = same[None] & attention_mask.astype(bool)[:, None, :]
    return jnp.where(ok, 0.0, _MASK_MIN).astype(dtype)[:, None]


class CanineModel(Module):
    """Reference modeling_canine.py:727."""

    def __init__(self, config: CanineConfig, *, dtype, param_dtype,
                 add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        shallow = copy.deepcopy(config)
        shallow.num_hidden_layers = 1
        self.char_embeddings = CanineEmbeddings(config, **kw)
        self.initial_char_encoder = BertEncoder(shallow, **kw)
        self.chars_to_molecules = CharactersToMolecules(config, **kw)
        self.encoder = BertEncoder(config, **kw)
        self.projection = ConvProjection(config, **kw)
        self.final_char_encoder = BertEncoder(shallow, **kw)
        if add_pooling_layer:
            self.pooler = BertPooler(config, **kw)
        else:
            self.pooler = None

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, **kwargs):
        c = self.config
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        r = c.downsampling_rate
        # maxpool downsample of the char mask
        mol_mask = attention_mask.astype(jnp.float32).reshape(b, s // r, r).max(axis=-1)
        h = self.char_embeddings(params["char_embeddings"], input_ids,
                                 token_type_ids, position_ids)
        bias = _local_bias(b, s, c.local_transformer_stride, attention_mask, h.dtype)
        char_encoding, _ = self.initial_char_encoder(
            params["initial_char_encoder"], h, {"bias": bias, "is_causal": False})
        molecules = self.chars_to_molecules(params["chars_to_molecules"],
                                            char_encoding)
        mol_args = {"kv_valid": mol_mask.astype(jnp.int32), "is_causal": False}
        mol_out, _ = self.encoder(params["encoder"], molecules, mol_args)
        pooled = None
        if self.pooler is not None:
            pooled = self.pooler(params["pooler"], mol_out)
        # repeat molecules back to char resolution (reference _repeat_molecules)
        without_cls = mol_out[:, 1:]
        repeated = jnp.repeat(without_cls, r, axis=1)
        remainder = s % r
        last = jnp.repeat(mol_out[:, -1:], remainder + r, axis=1)
        repeated = jnp.concatenate([repeated, last], axis=1)
        concat = jnp.concatenate([char_encoding, repeated], axis=-1)
        seq = self.projection(params["projection"], concat)
        char_args = {"kv_valid": attention_mask, "is_causal": False}
        seq, _ = self.final_char_encoder(params["final_char_encoder"], seq,
                                         char_args)
        return CanineModelOutputWithPooling(last_hidden_state=seq,
                                            pooler_output=pooled)


class CaninePreTrainedModel(PreTrainedModel):
    config_class = CanineConfig
    base_model_prefix = "canine"
    _keys_to_ignore_on_load_unexpected = (r"position_ids$",)


class CanineModelStandalone(CaninePreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.canine = CanineModel(config, dtype=self.dtype,
                                  param_dtype=self.param_dtype)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, **kwargs):
        return self.canine(params["canine"], input_ids, attention_mask,
                           token_type_ids, position_ids)


class CanineForSequenceClassification(CaninePreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.canine = CanineModel(config, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, labels=None, **kwargs):
        out = self.canine(params["canine"], input_ids, attention_mask,
                          token_type_ids, position_ids)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)


class CanineForMultipleChoice(CaninePreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.canine = CanineModel(config, **kw)
        self.classifier = Linear(config.hidden_size, 1, True, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs):
        b, n, s = input_ids.shape
        flat = lambda x: None if x is None else x.reshape(-1, s)
        out = self.canine(params["canine"], flat(input_ids),
                          flat(attention_mask), flat(token_type_ids))
        logits = self.classifier(params["classifier"], out.pooler_output)
        logits = logits.reshape(b, n)
        loss = None
        if labels is not None:
            from ...loss import cross_entropy

            loss = cross_entropy(logits, labels)
        return SequenceClassifierOutput(loss=loss, logits=logits)


class CanineForTokenClassification(CaninePreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.canine = CanineModel(config, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs):
        out = self.canine(params["canine"], input_ids, attention_mask,
                          token_type_ids)
        logits = self.classifier(params["classifier"], out.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_token_classification_loss

            loss = for_token_classification_loss(logits, labels, self.config)
        return TokenClassifierOutput(loss=loss, logits=logits)


class CanineForQuestionAnswering(CaninePreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.canine = CanineModel(config, **kw)
        self.qa_outputs = Linear(config.hidden_size, 2, True, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, start_positions=None, end_positions=None,
                 **kwargs):
        out = self.canine(params["canine"], input_ids, attention_mask,
                          token_type_ids)
        logits = self.qa_outputs(params["qa_outputs"], out.last_hidden_state)
        start_logits, end_logits = logits[..., 0], logits[..., 1]
        loss = None
        if start_positions is not None and end_positions is not None:
            from ...loss import for_question_answering_loss

            loss = for_question_answering_loss(start_logits, end_logits,
                                               start_positions, end_positions)
        return QuestionAnsweringModelOutput(loss=loss, start_logits=start_logits,
                                            end_logits=end_logits)
