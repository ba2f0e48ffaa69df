"""M2M100 / NLLB (reference src/transformers/models/m2m_100/modeling_m2m_100.py).

BART skeleton with pre-LN layers, final encoder/decoder ``layer_norm``
(:537,:626), NO layernorm_embedding, fairseq-layout sinusoidal positions
computed on the fly — NOT stored in checkpoints (nn.Buffer persistent=False,
:97) — with offset 2 and PAD-AWARE position ids
(create_position_ids_from_input_ids :165: ``cumsum(mask)*mask +
padding_idx``), tied bias-free lm_head, no final_logits_bias (:820-825).

NLLB checkpoints (facebook/nllb-200-*) use this same architecture and
model_type.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ...core.module import Module
from ..bart.modeling_bart import (
    BartDecoder,
    BartDecoderLayer,
    BartEncoder,
    BartEncoderLayer,
    BartForConditionalGeneration,
    BartModel,
)
from .configuration_m2m_100 import M2M100Config


def fairseq_sinusoid_table(n_pos: int, dim: int, padding_idx: int) -> np.ndarray:
    """reference M2M100SinusoidalPositionalEmbedding.get_embedding (:100-118)."""
    half = dim // 2
    emb = np.exp(np.arange(half, dtype=np.float64) * -(math.log(10000) / (half - 1)))
    emb = np.arange(n_pos, dtype=np.float64)[:, None] * emb[None, :]
    table = np.concatenate([np.sin(emb), np.cos(emb)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((n_pos, 1))], axis=1)
    table[padding_idx, :] = 0
    return table.astype(np.float32)


class M2M100SinusoidalPositionalEmbedding(Module):
    """Weightless position table (buffer in the reference, never in
    checkpoints)."""

    OFFSET = 2

    def __init__(self, num_positions, features, padding_idx=1, **kw):
        kw.pop("embedding_init", None)
        super().__init__(**kw)
        self.table = fairseq_sinusoid_table(num_positions + self.OFFSET, features, padding_idx)

    def init(self, rng):
        return {}

    def __call__(self, params, positions):
        return jnp.take(jnp.asarray(self.table, self.dtype), positions, axis=0)


class M2M100EncoderLayer(BartEncoderLayer):
    pre_norm = True


class M2M100DecoderLayer(BartDecoderLayer):
    pre_norm = True


class M2M100Encoder(BartEncoder):
    layer_cls = M2M100EncoderLayer
    use_layernorm_embedding = False
    use_final_norm = True

    def make_positions(self, config, **kw):
        return M2M100SinusoidalPositionalEmbedding(
            config.max_position_embeddings, config.d_model,
            padding_idx=config.pad_token_id, **kw)

    def encoder_positions(self, b, s, attention_mask):
        # reference create_position_ids_from_input_ids (:165): padded slots
        # stay at padding_idx (a zero table row).
        pad = self.config.pad_token_id
        if attention_mask is None:
            return jnp.arange(1, s + 1, dtype=jnp.int32)[None, :] + pad
        mask = attention_mask.astype(jnp.int32)
        return jnp.cumsum(mask, axis=-1) * mask + pad


class M2M100Decoder(BartDecoder):
    layer_cls = M2M100DecoderLayer
    use_layernorm_embedding = False
    use_final_norm = True

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.pos_start = config.pad_token_id + 1

    def make_positions(self, config, **kw):
        return M2M100SinusoidalPositionalEmbedding(
            config.max_position_embeddings, config.d_model,
            padding_idx=config.pad_token_id, **kw)


class M2M100Model(BartModel):
    encoder_cls = M2M100Encoder
    decoder_cls = M2M100Decoder


class M2M100ForConditionalGeneration(BartForConditionalGeneration):
    config_class = M2M100Config
    model_cls = M2M100Model
    use_final_logits_bias = False
