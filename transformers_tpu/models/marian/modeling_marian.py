"""MarianMT (reference src/transformers/models/marian/modeling_marian.py).

BART skeleton (post-LN) with fixed XLM-layout sinusoidal positions
(reference MarianSinusoidalPositionalEmbedding :72-93 — identical table to
Pegasus), NO layernorm_embedding, no final layer_norm, tied lm_head +
``final_logits_bias``.
"""

from __future__ import annotations

from ..bart.modeling_bart import (
    BartDecoder,
    BartEncoder,
    BartForConditionalGeneration,
    BartModel,
)
from ..pegasus.modeling_pegasus import PegasusSinusoidalPositionalEmbedding
from .configuration_marian import MarianConfig


class MarianEncoder(BartEncoder):
    pos_cls = PegasusSinusoidalPositionalEmbedding
    use_layernorm_embedding = False


class MarianDecoder(BartDecoder):
    pos_cls = PegasusSinusoidalPositionalEmbedding
    use_layernorm_embedding = False


class MarianModel(BartModel):
    encoder_cls = MarianEncoder
    decoder_cls = MarianDecoder


class MarianMTModel(BartForConditionalGeneration):
    config_class = MarianConfig
    model_cls = MarianModel
    # frozen sinusoid tables are not saved by the reference
    _keys_to_ignore_on_load_missing = (r"\.embed_positions\.weight$",)
