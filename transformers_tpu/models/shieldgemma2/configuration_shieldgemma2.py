"""ShieldGemma 2 config (reference models/shieldgemma2/configuration_shieldgemma2.py):
a Gemma3 (4B) image+text composition plus the yes/no verdict token indices."""

from __future__ import annotations

from ..gemma3.configuration_gemma3 import Gemma3Config


class ShieldGemma2Config(Gemma3Config):
    model_type = "shieldgemma2"

    def __init__(self, text_config=None, vision_config=None,
                 yes_token_index=10_784, no_token_index=3771, **kwargs):
        super().__init__(text_config=text_config, vision_config=vision_config,
                         **kwargs)
        self.yes_token_index = yes_token_index
        self.no_token_index = no_token_index
