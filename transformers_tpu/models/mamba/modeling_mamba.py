"""Mamba (selective state space) decoder, TPU-native.

Semantics match reference src/transformers/models/mamba/modeling_mamba.py:
in_proj gate split (:319/:396), depthwise causal conv (:303), input-dependent
dt/B/C via x_proj + dt_proj with softplus (:321-323, :433-439), selective
scan  s_l = exp(A·dt_l)·s_{l-1} + dt_l·B_l·x_l,  y_l = ⟨s_l, C_l⟩ + D·x_l,
gated by silu (:174-280), residual blocks with optional fp32 residual (:505),
tied lm_head (:710). Checkpoint layout ``backbone.{embeddings,layers.N.
{norm,mixer.*},norm_f}``.

TPU-native choices (vs the reference's CUDA mamba_ssm kernels):
- the sequence scan is ``jax.lax.associative_scan`` over (exp(A dt), dt·B·x)
  with combine (aL·aR, aR·bL + bR) — O(log L) depth on the VPU, the same
  recurrence the reference only reaches via torch 2.9's associative_scan;
- the depthwise conv is one ``lax.conv_general_dilated`` with
  feature_group_count = channels;
- decode is a single recurrent step over a (conv window, ssm state) cache —
  no sequence dim at all, so each generated token is O(I·N) work.

Scan memory is O(B·L·I·N) f32; a chunked scan is the follow-up optimization
for very long prompts.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from .configuration_mamba import MambaConfig


@partial(jax.tree_util.register_dataclass,
         data_fields=["conv_states", "ssm_states"], meta_fields=["initialized"])
@dataclass
class MambaCache:
    """Recurrent cache: per-layer conv window [B, I, K] + ssm state [B, I, N]
    (reference MambaCache). ``initialized`` is static metadata: False during
    prefill (states are zeros), True in the decode loop."""

    conv_states: tuple
    ssm_states: tuple
    initialized: bool = False

    # Duck-typing with the KV-cache interface generate() touches
    max_len = None


def selective_scan(x, dt, A, B, C, D):
    """Associative selective scan, [B, L, I] layout.

    x/dt [B,L,I]; A [I,N]; B/C [B,L,N]; D [I]. Returns (y [B,L,I],
    final_state [B,I,N]). All math float32 like the reference kernel."""
    dA = jnp.exp(dt[..., None] * A[None, None])          # [B,L,I,N]
    dBx = dt[..., None] * B[:, :, None, :] * x[..., None]  # [B,L,I,N]

    def combine(left, right):
        aL, bL = left
        aR, bR = right
        return aL * aR, aR * bL + bR

    _, states = jax.lax.associative_scan(combine, (dA, dBx), axis=1)
    y = jnp.einsum("blin,bln->bli", states, C) + x * D[None, None]
    return y, states[:, -1]


class MambaMixer(Module):
    def __init__(self, config: MambaConfig, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.hidden_size = config.hidden_size
        self.intermediate = config.intermediate_size
        self.state_size = config.state_size
        self.conv_kernel = config.conv_kernel
        self.time_step_rank = config.time_step_rank
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.in_proj = Linear(config.hidden_size, self.intermediate * 2, config.use_bias, **kw)
        self.x_proj = Linear(self.intermediate, self.time_step_rank + 2 * self.state_size, False, **kw)
        self.dt_proj = Linear(self.time_step_rank, self.intermediate, True, **kw)
        self.out_proj = Linear(self.intermediate, config.hidden_size, config.use_bias, **kw)
        self.act = get_activation(config.hidden_act)
        self.use_conv_bias = config.use_conv_bias

    def init(self, rng):
        params = super().init(rng)
        # conv1d: torch depthwise layout [I, 1, K]
        k1, k2 = jax.random.split(rng)
        params["conv1d"] = {"weight": normal_init(0.02)(k1, (self.intermediate, 1, self.conv_kernel),
                                                        self.param_dtype)}
        if self.use_conv_bias:
            params["conv1d"]["bias"] = jnp.zeros((self.intermediate,), self.param_dtype)
        # S4D-real init (reference init_mamba_weights :335-355)
        A = jnp.broadcast_to(jnp.arange(1, self.state_size + 1, dtype=jnp.float32)[None, :],
                             (self.intermediate, self.state_size))
        params["A_log"] = jnp.log(A).astype(self.param_dtype)
        params["D"] = jnp.ones((self.intermediate,), self.param_dtype)
        return params

    def normalize_dt_b_c(self, params, dt_in, B, C):
        """Hook for FalconMamba's weightless (and Jamba's weighted) RMS norms
        on dt/B/C after the x_proj split."""
        return dt_in, B, C

    def _conv_full(self, params, x):  # x [B, L, I] -> causal depthwise conv
        w = params["conv1d"]["weight"].astype(jnp.float32)  # [I, 1, K]
        y = jax.lax.conv_general_dilated(
            jnp.swapaxes(x, 1, 2).astype(jnp.float32), w, window_strides=(1,),
            padding=[(self.conv_kernel - 1, 0)],
            dimension_numbers=("NCW", "OIW", "NCW"),
            feature_group_count=self.intermediate)
        if self.use_conv_bias:
            y = y + params["conv1d"]["bias"].astype(jnp.float32)[None, :, None]
        return jnp.swapaxes(y, 1, 2)  # [B, L, I]

    def __call__(self, params, hidden, cache: Optional[MambaCache], attention_mask=None):
        b, s, _ = hidden.shape
        if attention_mask is not None:
            hidden = hidden * attention_mask[..., None].astype(hidden.dtype)
        proj = self.in_proj(params["in_proj"], hidden)  # [B, L, 2I]
        x, gate = jnp.split(proj, 2, axis=-1)
        A = -jnp.exp(params["A_log"].astype(jnp.float32))
        D = params["D"].astype(jnp.float32)

        decode = cache is not None and cache.initialized and s == 1
        if decode:
            # roll the conv window and apply the kernel at its last position
            conv_state = cache.conv_states[self.layer_idx]  # [B, I, K]
            conv_state = jnp.concatenate(
                [conv_state[:, :, 1:], jnp.swapaxes(x, 1, 2).astype(conv_state.dtype)], axis=2)
            w = params["conv1d"]["weight"].astype(jnp.float32)[:, 0, :]  # [I, K]
            cx = jnp.sum(conv_state.astype(jnp.float32) * w[None], axis=-1)  # [B, I]
            if self.use_conv_bias:
                cx = cx + params["conv1d"]["bias"].astype(jnp.float32)[None]
            cx = self.act(cx)[:, None, :]  # [B, 1, I]
        else:
            if attention_mask is not None:
                x = x * attention_mask[..., None].astype(x.dtype)
            cx = self.act(self._conv_full(params, x))
            if cache is not None:
                # stash the last K raw inputs as the conv window
                pad = jnp.zeros((b, self.intermediate, max(self.conv_kernel - s, 0)), jnp.float32)
                window = jnp.concatenate(
                    [pad, jnp.swapaxes(x.astype(jnp.float32), 1, 2)], axis=2)[:, :, -self.conv_kernel:]
                conv_state = window

        if attention_mask is not None and not decode:
            cx = cx * attention_mask[..., None].astype(cx.dtype)
        dbc = self.x_proj(params["x_proj"], cx.astype(self.dtype))
        dt_in, B, C = jnp.split(
            dbc, [self.time_step_rank, self.time_step_rank + self.state_size], axis=-1)
        dt_in, B, C = self.normalize_dt_b_c(params, dt_in, B, C)
        dt = jnp.einsum("blr,ri->bli", dt_in.astype(jnp.float32),
                        params["dt_proj"]["weight"].astype(jnp.float32))
        dt = jax.nn.softplus(dt + params["dt_proj"]["bias"].astype(jnp.float32)[None, None])

        xf = cx.astype(jnp.float32)
        Bf = B.astype(jnp.float32)
        Cf = C.astype(jnp.float32)
        if decode:
            ssm = cache.ssm_states[self.layer_idx].astype(jnp.float32)  # [B, I, N]
            dA = jnp.exp(dt[:, 0, :, None] * A[None])                   # [B, I, N]
            dBx = dt[:, 0, :, None] * Bf[:, 0, None, :] * xf[:, 0, :, None]
            ssm = dA * ssm + dBx
            y = jnp.einsum("bin,bn->bi", ssm, Cf[:, 0])[:, None, :] + xf * D[None, None]
            final_state = ssm
        else:
            y, final_state = selective_scan(xf, dt, A, Bf, Cf, D)

        y = y * self.act(gate.astype(jnp.float32))
        out = self.out_proj(params["out_proj"], y.astype(self.dtype))
        if cache is not None:
            cache = replace(
                cache,
                conv_states=cache.conv_states[: self.layer_idx] + (conv_state.astype(cache.conv_states[self.layer_idx].dtype),)
                + cache.conv_states[self.layer_idx + 1:],
                ssm_states=cache.ssm_states[: self.layer_idx] + (final_state.astype(cache.ssm_states[self.layer_idx].dtype),)
                + cache.ssm_states[self.layer_idx + 1:],
            )
        return out, cache


class MambaBlock(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.residual_in_fp32 = config.residual_in_fp32
        self.norm = RMSNorm(config.hidden_size, config.layer_norm_epsilon,
                            dtype=dtype, param_dtype=param_dtype)
        self.mixer = MambaMixer(config, layer_idx, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, cache, attention_mask):
        residual = hidden.astype(jnp.float32) if self.residual_in_fp32 else hidden
        h = self.norm(params["norm"], hidden)
        h, cache = self.mixer(params["mixer"], h, cache, attention_mask)
        return (residual + h.astype(residual.dtype)).astype(hidden.dtype), cache


class MambaModel(Module):
    def __init__(self, config: MambaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = Embedding(config.vocab_size, config.hidden_size,
                                    embedding_init=normal_init(config.initializer_range), **kw)
        self.layers = [MambaBlock(config, i, **kw) for i in range(config.num_hidden_layers)]
        self.norm_f = RMSNorm(config.hidden_size, config.layer_norm_epsilon, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values: Optional[MambaCache] = None, cache_position=0,
                 inputs_embeds=None, output_hidden_states=False) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.embeddings(params["embeddings"], input_ids)
        hidden = inputs_embeds
        s = hidden.shape[1]
        # the mask indexes CURRENT tokens only (no kv-length concept); padded
        # slots zero the mixer inputs so left-padded prefill state stays exact
        if attention_mask is not None and attention_mask.shape[1] != s:
            attention_mask = attention_mask[:, :s] if not (
                past_key_values is not None and past_key_values.initialized) else None
        cache = past_key_values
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, cache = layer(params["layers"][str(i)], hidden, cache, attention_mask)
        hidden = self.norm_f(params["norm_f"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        if cache is not None and not cache.initialized:
            cache = replace(cache, initialized=True)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class MambaPreTrainedModel(PreTrainedModel):
    config_class = MambaConfig
    base_model_prefix = "backbone"


class MambaForCausalLM(MambaPreTrainedModel, GenerationMixin):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.backbone = MambaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.hidden_size, config.vocab_size, False,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  kernel_init=normal_init(config.initializer_range))

    def get_input_embedding_path(self):
        return "backbone.embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None, labels=None,
                 logits_to_keep: int = 0, output_hidden_states: bool = False) -> CausalLMOutputWithPast:
        outputs = self.backbone(
            params["backbone"], input_ids, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        if self.config.tie_word_embeddings:
            logits = self.backbone.embeddings.attend(params["backbone"]["embeddings"], hidden)
        else:
            logits = self.lm_head(params["lm_head"], hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(
            loss=loss, logits=logits, past_key_values=outputs.past_key_values,
            hidden_states=outputs.hidden_states)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        """Recurrent cache — constant size regardless of max_len."""
        cfg = self.config
        dtype = dtype or self.dtype
        conv = tuple(jnp.zeros((batch_size, cfg.intermediate_size, cfg.conv_kernel), dtype)
                     for _ in range(cfg.num_hidden_layers))
        ssm = tuple(jnp.zeros((batch_size, cfg.intermediate_size, cfg.state_size), jnp.float32)
                    for _ in range(cfg.num_hidden_layers))
        return MambaCache(conv_states=conv, ssm_states=ssm, initialized=False)


class MambaModelStandalone(MambaPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.backbone = MambaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.backbone(params["backbone"], *args, **kwargs)
