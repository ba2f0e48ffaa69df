"""FalconMamba config (reference
src/transformers/models/falcon_mamba/configuration_falcon_mamba.py)."""

from __future__ import annotations

from ..mamba.configuration_mamba import MambaConfig


class FalconMambaConfig(MambaConfig):
    model_type = "falcon_mamba"

    def __init__(self, *args, mixer_rms_eps=1e-6, **kwargs):
        self.mixer_rms_eps = mixer_rms_eps
        super().__init__(*args, **kwargs)
