"""ConvNeXt V2 config (reference src/transformers/models/convnextv2/configuration_convnextv2.py)."""

from __future__ import annotations

from ..convnext.configuration_convnext import ConvNextConfig


class ConvNextV2Config(ConvNextConfig):
    model_type = "convnextv2"
