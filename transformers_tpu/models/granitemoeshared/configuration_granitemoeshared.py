"""GraniteMoeShared config (reference src/transformers/models/granitemoeshared)."""

from __future__ import annotations

from ..granitemoe.configuration_granitemoe import GraniteMoeConfig


class GraniteMoeSharedConfig(GraniteMoeConfig):
    model_type = "granitemoeshared"

    def __init__(self, shared_intermediate_size=1024, **kwargs):
        super().__init__(**kwargs)
        self.shared_intermediate_size = shared_intermediate_size
