"""VaultGemma config (reference src/transformers/models/vaultgemma/modular_vaultgemma.py)."""

from __future__ import annotations

from ..gemma2.configuration_gemma2 import Gemma2Config


class VaultGemmaConfig(Gemma2Config):
    model_type = "vaultgemma"
