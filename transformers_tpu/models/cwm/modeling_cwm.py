"""CWM decoder (reference src/transformers/models/cwm/modular_cwm.py):
Llama skeleton with llama3-scaled 1M-theta rope and alternating
sliding/full attention layers (``layer_types``, window 8192). The skeleton's
``layer_sliding_window`` handles the per-layer windows natively."""

from __future__ import annotations

from ..llama.modeling_llama import (
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_cwm import CwmConfig


class CwmModel(LlamaModel):
    pass


class CwmForCausalLM(LlamaForCausalLM):
    config_class = CwmConfig
    model_cls = CwmModel


class CwmModelStandalone(LlamaModelStandalone):
    config_class = CwmConfig
    model_cls = CwmModel
