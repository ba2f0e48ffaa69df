"""Swin V2 config (reference src/transformers/models/swinv2/configuration_swinv2.py)."""

from __future__ import annotations

from ..swin.configuration_swin import SwinConfig


class Swinv2Config(SwinConfig):
    model_type = "swinv2"

    def __init__(self, pretrained_window_sizes=(0, 0, 0, 0), **kwargs):
        self.pretrained_window_sizes = list(pretrained_window_sizes)
        super().__init__(**kwargs)
