"""OLMo-Hybrid decoder (reference models/olmo_hybrid/modular_olmo_hybrid.py).

Hybrid of the Qwen3-Next gated-DeltaNet machinery with OLMo's attention:
- full-attention layers: Olmo2/3-style whole-projection q/k RMSNorms in a
  POST-norm residual block; NoPE by default (released checkpoints set
  rope_theta None — rope is skipped entirely, reference :150-200)
- linear-attention layers: GatedDeltaNet with FULLY separate
  q/k/v/a/b/g projections (no fused qkvz), a dedicated g_proj gate for the
  gated output norm (FLA eps 1e-5), and allow_neg_eigval — beta = 2·sigmoid
  spanning [0, 2] (reference :219-260); these layers keep the PRE-norm
  Llama block shape (reference OlmoHybridLinearAttentionDecoderLayer)
- dense SwiGLU MLP everywhere (no MoE)
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Linear, normal_init
from ..llama.modeling_llama import LlamaForCausalLM, LlamaModelStandalone
from ..olmo2.modeling_olmo2 import Olmo2Attention, Olmo2DecoderLayer
from ..qwen3_next.modeling_qwen3_next import (
    Qwen3NextDecoderLayer,
    Qwen3NextForCausalLM,
    Qwen3NextGatedDeltaNet,
    Qwen3NextModel,
    Qwen3NextModelStandalone,
)
from .configuration_olmo_hybrid import OlmoHybridConfig


class OlmoHybridAttention(Olmo2Attention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        # NoPE mode (reference :180): no rope when the config carries no theta
        self.apply_rope = config.rope_theta is not None


class OlmoHybridGatedDeltaNet(Qwen3NextGatedDeltaNet):
    """Separate q/k/v/a/b/g projections + beta in [0,2] (reference :219)."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.beta_scale = 2.0 if config.linear_allow_neg_eigval else 1.0
        # FLA FusedRMSNormGated default
        self.eps = 1e-5
        del self._children["in_proj_qkvz"]
        object.__delattr__(self, "in_proj_qkvz")
        del self._children["in_proj_ba"]
        object.__delattr__(self, "in_proj_ba")
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.q_proj = Linear(self.hidden_size, self.key_dim, False, **kw)
        self.k_proj = Linear(self.hidden_size, self.key_dim, False, **kw)
        self.v_proj = Linear(self.hidden_size, self.value_dim, False, **kw)
        self.a_proj = Linear(self.hidden_size, self.num_v_heads, False, **kw)
        self.b_proj = Linear(self.hidden_size, self.num_v_heads, False, **kw)
        self.g_proj = Linear(self.hidden_size, self.value_dim, False, **kw)

    def project_in(self, params, hidden):
        b, s, _ = hidden.shape
        mixed = jnp.concatenate([
            self.q_proj(params["q_proj"], hidden),
            self.k_proj(params["k_proj"], hidden),
            self.v_proj(params["v_proj"], hidden)], axis=-1)
        z = self.g_proj(params["g_proj"], hidden).reshape(
            b, s, self.num_v_heads, self.head_v_dim)
        b_ = self.b_proj(params["b_proj"], hidden)
        a_ = self.a_proj(params["a_proj"], hidden)
        return mixed, z, b_, a_


class OlmoHybridDecoderLayer(Qwen3NextDecoderLayer):
    """linear_attention layers: pre-norm Llama shape around the deltanet;
    full_attention layers: delegated to the POST-norm Olmo2 block below."""

    deltanet_cls = OlmoHybridGatedDeltaNet

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        from ...core.module import Module, RMSNorm
        from ..llama.modeling_llama import LlamaMLP

        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.block_type = "linear_attention"
        self.linear_attn = self.deltanet_cls(config, layer_idx, **kw)
        self.mlp = LlamaMLP(config, **kw)
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.post_attention_layernorm = RMSNorm(config.hidden_size,
                                                config.rms_norm_eps, **kw)


class _OlmoHybridAttnLayer(Olmo2DecoderLayer):
    attention_cls = OlmoHybridAttention


class _HybridLayerDispatch:
    """Picks the block shape per layer_types (reference OlmoHybridModel)."""

    def __new__(cls, config, layer_idx, *, dtype, param_dtype):
        if config.layer_types[layer_idx] == "linear_attention":
            return OlmoHybridDecoderLayer(config, layer_idx,
                                          dtype=dtype, param_dtype=param_dtype)
        return _OlmoHybridAttnLayer(config, layer_idx,
                                    dtype=dtype, param_dtype=param_dtype)

    # final-norm factory (LlamaModel reads it off decoder_layer_cls)
    make_norm = staticmethod(Olmo2DecoderLayer.make_norm)


class OlmoHybridModel(Qwen3NextModel):
    decoder_layer_cls = _HybridLayerDispatch

    def __init__(self, config, *, dtype, param_dtype):
        if config.rope_theta is None:
            # NoPE checkpoints: build an inert rope table, never applied
            import copy

            shim = copy.copy(config)
            shim.rope_theta = 10000.0
            super().__init__(shim, dtype=dtype, param_dtype=param_dtype)
            self.config = config
        else:
            super().__init__(config, dtype=dtype, param_dtype=param_dtype)

    def compute_rope(self, position_ids):
        if self.config.rope_theta is None:
            return None, None
        return super().compute_rope(position_ids)

    def rope_for_layer(self, rope, layer_idx):
        return rope


class OlmoHybridForCausalLM(Qwen3NextForCausalLM):
    config_class = OlmoHybridConfig
    model_cls = OlmoHybridModel
    _weight_rules = ()

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        from ...cache_utils import init_hybrid_cache

        cfg = self.config
        conv_dim = 2 * cfg.linear_num_key_heads * cfg.linear_key_head_dim \
            + cfg.linear_num_value_heads * cfg.linear_value_head_dim
        return init_hybrid_cache(
            batch_size=batch_size, max_len=max_len, dtype=dtype or self.dtype,
            block_types=["attention" if t == "full_attention" else "linear"
                         for t in cfg.layer_types],
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.hidden_size // cfg.num_attention_heads,
            conv_shape=(conv_dim, cfg.linear_conv_kernel_dim),
            ssm_shape=(cfg.linear_num_value_heads, cfg.linear_key_head_dim,
                       cfg.linear_value_head_dim))


class OlmoHybridModelStandalone(Qwen3NextModelStandalone):
    config_class = OlmoHybridConfig
    model_cls = OlmoHybridModel
    _weight_rules = ()
