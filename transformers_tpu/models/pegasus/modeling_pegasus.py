"""Pegasus (reference src/transformers/models/pegasus/modeling_pegasus.py).

BART skeleton with pre-LN layers, final encoder/decoder ``layer_norm``, NO
layernorm_embedding, and FIXED sinusoidal positions in the "XLM layout"
(reference PegasusSinusoidalPositionalEmbedding :74-93 — sin of even
frequencies in the first half, cos of odd frequencies in the second half).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ...core.module import Embedding
from ..bart.modeling_bart import (
    BartDecoder,
    BartDecoderLayer,
    BartEncoder,
    BartEncoderLayer,
    BartForConditionalGeneration,
    BartModel,
)
from .configuration_pegasus import PegasusConfig


def xlm_sinusoid_table(n_pos: int, dim: int) -> np.ndarray:
    """reference PegasusSinusoidalPositionalEmbedding.create_weight (:80-93)."""
    position_enc = np.array(
        [[pos / np.power(10000, 2 * (j // 2) / dim) for j in range(dim)] for pos in range(n_pos)]
    )
    out = np.zeros((n_pos, dim), dtype=np.float32)
    sentinel = dim // 2 if dim % 2 == 0 else (dim // 2) + 1
    out[:, :sentinel] = np.sin(position_enc[:, 0::2])
    out[:, sentinel:] = np.cos(position_enc[:, 1::2])
    return out


class PegasusSinusoidalPositionalEmbedding(Embedding):
    """Frozen sinusoid table; init recomputes it so checkpoints that omit the
    buffer still produce exact reference values."""

    def __init__(self, num_positions, features, **kw):
        kw.pop("embedding_init", None)
        super().__init__(num_positions, features, **kw)

    def init(self, rng):
        return {"weight": jnp.asarray(
            xlm_sinusoid_table(self.num_embeddings, self.features), self.param_dtype)}


class PegasusEncoderLayer(BartEncoderLayer):
    pre_norm = True


class PegasusDecoderLayer(BartDecoderLayer):
    pre_norm = True


class PegasusEncoder(BartEncoder):
    layer_cls = PegasusEncoderLayer
    pos_cls = PegasusSinusoidalPositionalEmbedding
    use_layernorm_embedding = False
    use_final_norm = True


class PegasusDecoder(BartDecoder):
    layer_cls = PegasusDecoderLayer
    pos_cls = PegasusSinusoidalPositionalEmbedding
    use_layernorm_embedding = False
    use_final_norm = True


class PegasusModel(BartModel):
    encoder_cls = PegasusEncoder
    decoder_cls = PegasusDecoder


class PegasusForConditionalGeneration(BartForConditionalGeneration):
    config_class = PegasusConfig
    model_cls = PegasusModel
    # frozen sinusoid tables may be absent from checkpoints
    _keys_to_ignore_on_load_missing = (r"\.embed_positions\.weight$",)
