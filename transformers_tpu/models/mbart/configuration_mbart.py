"""mBART config (reference src/transformers/models/mbart/configuration_mbart.py)."""

from __future__ import annotations

from ..bart.configuration_bart import BartConfig


class MBartConfig(BartConfig):
    model_type = "mbart"

    def __init__(self, decoder_start_token_id=None, **kwargs):
        # HF MBartConfig has NO decoder_start_token_id default (generation
        # falls back to bos; multilingual use passes the language id).
        super().__init__(decoder_start_token_id=decoder_start_token_id, **kwargs)
