"""FalconMamba decoder (reference
src/transformers/models/falcon_mamba/modeling_falcon_mamba.py): Mamba with
WEIGHTLESS RMS norms on dt/B/C after the x_proj split (:458-469, the only
architectural delta — the dummy norm weights in checkpoints are buffers and
never load)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mamba.modeling_mamba import (
    MambaBlock,
    MambaForCausalLM,
    MambaMixer,
    MambaModel,
    MambaModelStandalone,
)
from .configuration_falcon_mamba import FalconMambaConfig


def _weightless_rms(x, eps):
    h = x.astype(jnp.float32)
    return (h * jax.lax.rsqrt(jnp.mean(h * h, axis=-1, keepdims=True) + eps)).astype(x.dtype)


class FalconMambaMixer(MambaMixer):
    def normalize_dt_b_c(self, params, dt_in, B, C):
        eps = self.config.mixer_rms_eps
        return (_weightless_rms(dt_in, eps), _weightless_rms(B, eps),
                _weightless_rms(C, eps))


class FalconMambaBlock(MambaBlock):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.mixer = FalconMambaMixer(config, layer_idx, dtype=dtype, param_dtype=param_dtype)


class FalconMambaModel(MambaModel):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.layers = [FalconMambaBlock(config, i, dtype=dtype, param_dtype=param_dtype)
                       for i in range(config.num_hidden_layers)]


class FalconMambaForCausalLM(MambaForCausalLM):
    config_class = FalconMambaConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.backbone = FalconMambaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)


class FalconMambaModelStandalone(MambaModelStandalone):
    config_class = FalconMambaConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.backbone = FalconMambaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
