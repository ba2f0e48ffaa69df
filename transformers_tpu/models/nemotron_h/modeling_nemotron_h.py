"""NemotronH hybrid decoder (reference
src/transformers/models/nemotron_h/modular_nemotron_h.py): a per-layer block
pattern over four mixer types —

- ``linear_attention``: Mamba2 SSD mixer (Zamba2 geometry: intermediate =
  mamba_num_heads * mamba_head_dim, grouped gated RMSNorm),
- ``full_attention``: rope-free GQA (Jamba-style NoPE),
- ``mlp``: ungated squared-ReLU up/down (Nemotron MLP),
- ``moe``: DeepSeek-style sigmoid router over NON-GATED up/down experts with
  shared experts and an optional latent bottleneck projection.

Each block is norm -> mixer -> residual (one norm per block). Hub layout is
mamba-style: ``backbone.{embedding, layers.N.{norm, mixer.*}, norm_f}``.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Optional

import jax
import jax.numpy as jnp

from ...cache_utils import HybridCache, StaticKVCache
from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...generation.utils import GenerationMixin
from ...loss import for_causal_lm_loss
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..deepseek_v3.modeling_deepseek_v3 import _DeepseekGate, deepseek_route
from ..llama.modeling_llama import DECODER_TP_PLAN, LlamaAttention
from ..mamba2.modeling_mamba2 import Mamba2Mixer
from ..nemotron.modeling_nemotron import NemotronMLP
from .configuration_nemotron_h import NemotronHConfig


def _mamba2_view(config: NemotronHConfig):
    inter = config.mamba_num_heads * config.mamba_head_dim
    return SimpleNamespace(
        hidden_size=config.hidden_size,
        num_heads=config.mamba_num_heads,
        head_dim=config.mamba_head_dim,
        n_groups=config.n_groups,
        state_size=config.ssm_state_size,
        conv_kernel=config.conv_kernel,
        intermediate_size=inter,
        chunk_size=config.chunk_size,
        time_step_limit=config.time_step_limit,
        layer_norm_epsilon=config.layer_norm_epsilon,
        use_bias=config.use_bias,
        use_conv_bias=config.use_conv_bias,
        hidden_act=config.mamba_hidden_act,
        initializer_range=config.initializer_range,
        time_step_min=config.time_step_min,
        time_step_max=config.time_step_max,
        time_step_floor=config.time_step_floor,
        gated_norm_groups=config.n_groups,
    )


class NemotronHExpertMLP(Module):
    """One NON-GATED expert: down(act(up(x))) (reference NemotronHExperts).

    Expert slices are saved in the torch runtime [out, in] orientation and
    consumed STACKED by the MoE einsums in that same orientation, so loads
    skip the Linear [in, out] transpose — the Linear declarations below are
    (out, in) ordered purely so the expected storage shapes match."""

    def __init__(self, config, d_in, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range),
                  transpose_at_load=False)
        inter = config.moe_intermediate_size
        self.up_proj = Linear(inter, d_in, False, **kw)      # stores [I, Din]
        self.down_proj = Linear(d_in, inter, False, **kw)    # stores [Din, I]


class NemotronHMoE(Module):
    """Sigmoid group-limited router + non-gated experts + shared experts +
    optional latent projection (reference NemotronHMoE)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        self.gate = _DeepseekGate(config, **kw)
        d_in = config.moe_latent_size or config.hidden_size
        self.experts = [NemotronHExpertMLP(config, d_in, **kw)
                        for _ in range(config.n_routed_experts)]
        import copy

        shared_cfg = copy.copy(config)
        shared_cfg.intermediate_size = config.moe_shared_expert_intermediate_size
        self.shared_experts = NemotronMLP(shared_cfg, **kw)
        if config.moe_latent_size is not None:
            self.fc1_latent_proj = Linear(config.hidden_size, config.moe_latent_size,
                                          config.mlp_bias, **lkw)
            self.fc2_latent_proj = Linear(config.moe_latent_size, config.hidden_size,
                                          config.mlp_bias, **lkw)
        self.act_fn = get_activation(config.mlp_hidden_act)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(-1, h)
        scores = jax.nn.sigmoid(
            jnp.dot(x.astype(jnp.float32), params["gate"]["weight"].astype(jnp.float32)))
        topk_w, topk_idx = deepseek_route(
            scores, params["gate"]["e_score_correction_bias"].astype(jnp.float32),
            n_group=self.config.n_group, topk_group=self.config.topk_group,
            top_k=self.config.num_experts_per_tok,
            norm_topk_prob=self.config.norm_topk_prob,
            routed_scaling_factor=self.config.routed_scaling_factor)
        z = x
        if self.config.moe_latent_size is not None:
            z = self.fc1_latent_proj(params["fc1_latent_proj"], z)
        e = self.config.n_routed_experts
        w_up = jnp.stack([params["experts"][str(i)]["up_proj"]["weight"]
                          for i in range(e)])       # [E, I, Din] (torch [out, in])
        w_down = jnp.stack([params["experts"][str(i)]["down_proj"]["weight"]
                            for i in range(e)])     # [E, Din, I]
        # dense all-experts batched matmul, weighted combine (non-gated MLP)
        up = jnp.einsum("td,eid->eti", z.astype(self.dtype), w_up.astype(self.dtype))
        y = jnp.einsum("eti,edi->etd", self.act_fn(up), w_down.astype(self.dtype))
        y = jnp.swapaxes(y, 0, 1)                    # [T, E, Din]
        picked = jnp.take_along_axis(y, topk_idx[:, :, None], axis=1)
        routed = jnp.sum(picked * topk_w[:, :, None].astype(y.dtype), axis=1)
        if self.config.moe_latent_size is not None:
            routed = self.fc2_latent_proj(params["fc2_latent_proj"], routed)
        shared = self.shared_experts(params["shared_experts"], hidden)
        return routed.reshape(b, s, h) + shared


class NemotronHAttention(LlamaAttention):
    """NoPE GQA (reference inherits JambaAttention)."""


class NemotronHBlock(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.block_type = config.layers_block_type[layer_idx]
        self.norm = RMSNorm(config.hidden_size, config.layer_norm_epsilon, **kw)
        if self.block_type == "linear_attention":
            self.mixer = Mamba2Mixer(_mamba2_view(config), layer_idx, **kw)
        elif self.block_type == "full_attention":
            self.mixer = NemotronHAttention(config, layer_idx, **kw)
        elif self.block_type == "moe":
            self.mixer = NemotronHMoE(config, **kw)
        else:
            self.mixer = NemotronMLP(config, **kw)

    def __call__(self, params, hidden, attn_args, cache, cache_position, mamba_mask):
        residual = hidden
        h = self.norm(params["norm"], hidden)
        if self.block_type == "linear_attention":
            h, cache = self.mixer(params["mixer"], h, cache, mamba_mask)
        elif self.block_type == "full_attention":
            h, cache = self.mixer(params["mixer"], h, None, None, attn_args,
                                  cache, cache_position)
        else:
            h = self.mixer(params["mixer"], h)
        return residual + h, cache


class NemotronHModel(Module):
    def __init__(self, config: NemotronHConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embedding = Embedding(config.vocab_size, config.hidden_size,
                                   embedding_init=normal_init(config.initializer_range),
                                   **kw)
        self.layers = [NemotronHBlock(config, i, **kw)
                       for i in range(config.num_hidden_layers)]
        self.norm_f = RMSNorm(config.hidden_size, config.layer_norm_epsilon, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values: Optional[HybridCache] = None, cache_position=0,
                 inputs_embeds=None, output_hidden_states=False) -> BaseModelOutputWithPast:
        from dataclasses import replace

        if inputs_embeds is None:
            inputs_embeds = self.embedding(params["embedding"], input_ids)
        hidden = inputs_embeds
        b, s, _ = hidden.shape

        kv_len = past_key_values.max_len if past_key_values is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid,
                     "is_causal": True, "sliding_window": None}

        mamba_mask = attention_mask
        if mamba_mask is not None and mamba_mask.shape[1] != s:
            mamba_mask = mamba_mask[:, :s] if not (
                past_key_values is not None and past_key_values.initialized) else None

        all_hidden = [] if output_hidden_states else None
        cache = past_key_values
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, cache = layer(params["layers"][str(i)], hidden, attn_args,
                                  cache, cache_position, mamba_mask)
        hidden = self.norm_f(params["norm_f"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        if cache is not None and not cache.initialized:
            cache = replace(cache, initialized=True)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class NemotronHPreTrainedModel(PreTrainedModel):
    config_class = NemotronHConfig
    base_model_prefix = "backbone"


class NemotronHForCausalLM(NemotronHPreTrainedModel, GenerationMixin):
    _tp_plan = DECODER_TP_PLAN

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.backbone = NemotronHModel(config, dtype=self.dtype,
                                       param_dtype=self.param_dtype)
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.hidden_size, config.vocab_size, False,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  kernel_init=normal_init(config.initializer_range))

    def get_input_embedding_path(self):
        return "backbone.embedding.weight"

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 labels=None, logits_to_keep: int = 0,
                 output_hidden_states: bool = False) -> CausalLMOutputWithPast:
        outputs = self.backbone(
            params["backbone"], input_ids, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        if self.config.tie_word_embeddings:
            logits = self.backbone.embedding.attend(
                params["backbone"]["embedding"], hidden)
        else:
            logits = self.lm_head(params["lm_head"], hidden)
        loss = None
        if labels is not None:
            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(
            loss=loss, logits=logits, past_key_values=outputs.past_key_values,
            hidden_states=outputs.hidden_states)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        cfg = self.config
        dtype = dtype or self.dtype
        inter = cfg.mamba_num_heads * cfg.mamba_head_dim
        conv_dim = inter + 2 * cfg.n_groups * cfg.ssm_state_size
        keys, values, conv, ssm = [], [], [], []
        for t in cfg.layers_block_type:
            if t == "full_attention":
                keys.append(jnp.zeros((batch_size, max_len, cfg.num_key_value_heads,
                                       cfg.head_dim), dtype))
                values.append(jnp.zeros((batch_size, max_len, cfg.num_key_value_heads,
                                         cfg.head_dim), dtype))
            else:
                keys.append(None)
                values.append(None)
            if t == "linear_attention":
                conv.append(jnp.zeros((batch_size, conv_dim, cfg.conv_kernel), dtype))
                ssm.append(jnp.zeros((batch_size, cfg.mamba_num_heads,
                                      cfg.mamba_head_dim, cfg.ssm_state_size),
                                     jnp.float32))
            else:
                conv.append(None)
                ssm.append(None)
        kv = StaticKVCache(keys=tuple(keys), values=tuple(values),
                           layer_windows=(None,) * cfg.num_hidden_layers,
                           max_len=max_len)
        return HybridCache(kv=kv, conv_states=tuple(conv), ssm_states=tuple(ssm),
                           initialized=False)


class NemotronHModelStandalone(NemotronHPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.backbone = NemotronHModel(config, dtype=self.dtype,
                                       param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.backbone(params["backbone"], *args, **kwargs)
