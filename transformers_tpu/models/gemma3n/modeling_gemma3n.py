"""Gemma3n text decoder (reference models/gemma3n/modeling_gemma3n.py).

The MatFormer-era Gemma: every decoder layer wraps the transformer block in
**AltUp** (:1050 — 4 parallel hidden streams; a router predicts per-stream
mixing coefficients, the block runs on the active stream, and a correction
propagates its innovation to the others), adds a low-rank **LAuReL**
residual (:994), **per-layer embeddings** (a second 256-wide embedding table
whose slice gates into each layer, :1414-1433), unscaled attention
(scaling=1.0) with q/k/v head RMSNorms (v without scale), **KV sharing**
(the last 15 layers reuse the KV of the last non-shared layer of the same
attention type, :1299), Gaussian top-k activation sparsity in early MLPs
(:1040), dual-frequency rope (global/local), and a final tanh logit softcap.

The audio (conformer) and vision (MobileNetV5) towers of the multimodal
Gemma3n are not implemented yet; this module covers Gemma3nForCausalLM.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import StaticKVCache, init_static_cache, layer_sliding_window
from ...core.module import Embedding, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import (BaseModelOutputWithPast,
                                 CausalLMOutputWithPast)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from ...ops.rope import apply_rotary_pos_emb, compute_cos_sin, rope_inv_freq
from .configuration_gemma3n import Gemma3nTextConfig


class Gemma3nRMSNorm(Module):
    """float32 norm, plain ones-init scale; with_scale=False => unit scale."""

    def __init__(self, dim, eps, with_scale=True, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dim = dim
        self.eps = eps
        self.with_scale = with_scale

    def init(self, rng):
        if not self.with_scale:
            return {}
        return {"weight": jnp.ones((self.dim,), self.param_dtype)}

    def __call__(self, params, x):
        f = x.astype(jnp.float32)
        normed = f / jnp.sqrt(jnp.mean(f * f, axis=-1, keepdims=True) + self.eps)
        if self.with_scale:
            normed = normed * params["weight"].astype(jnp.float32)
        return normed.astype(x.dtype)


class Gemma3nTextLaurelBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.linear_left = Linear(config.hidden_size, config.laurel_rank, False, **kw)
        self.linear_right = Linear(config.laurel_rank, config.hidden_size, False, **kw)
        self.post_laurel_norm = Gemma3nRMSNorm(config.hidden_size, config.rms_norm_eps,
                                               dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        h = self.linear_right(params["linear_right"],
                              self.linear_left(params["linear_left"], x))
        return x + self.post_laurel_norm(params["post_laurel_norm"], h)


class Gemma3nTextMLP(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        inter = config.intermediate_size[layer_idx]
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.gate_proj = Linear(config.hidden_size, inter, False, **kw)
        self.up_proj = Linear(config.hidden_size, inter, False, **kw)
        self.down_proj = Linear(inter, config.hidden_size, False, **kw)
        self.act = get_activation(config.hidden_activation)
        self.sparsity = config.activation_sparsity_pattern[layer_idx]
        if self.sparsity > 0.0:
            # Phi^-1(sparsity) via scipy-free erfinv
            from math import sqrt

            self.std_multiplier = float(sqrt(2) * _erfinv(2 * self.sparsity - 1))

    def __call__(self, params, x):
        gate = self.gate_proj(params["gate_proj"], x)
        if self.sparsity > 0.0:
            mean = jnp.mean(gate, axis=-1, keepdims=True)
            std = jnp.std(gate, axis=-1, keepdims=True)
            cutoff = mean + std * jnp.asarray(self.std_multiplier, gate.dtype)
            gate = jax.nn.relu(gate - cutoff)
        return self.down_proj(params["down_proj"],
                              self.act(gate) * self.up_proj(params["up_proj"], x))


def _erfinv(y):
    """Inverse error function: torch.distributions Normal.icdf parity via
    scipy-free Newton refinement of the Winitzki seed."""
    a = 0.147
    ln = np.log(1 - y * y)
    t = 2 / (np.pi * a) + ln / 2
    x = np.sign(y) * np.sqrt(np.sqrt(t * t - ln / a) - t)
    for _ in range(3):  # Newton: erf(x) - y
        err = math.erf(float(x)) - y
        x = x - err / (2 / np.sqrt(np.pi) * np.exp(-float(x) ** 2))
    return float(x)


class Gemma3nTextAltUp(Module):
    """reference :1050."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        n = config.altup_num_inputs
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.correction_coefs = Linear(n, n, False, **kw)
        self.prediction_coefs = Linear(n, n * n, False, **kw)
        self.modality_router = Linear(config.hidden_size, n, False, **kw)
        self.router_norm = Gemma3nRMSNorm(config.hidden_size, config.rms_norm_eps,
                                          dtype=dtype, param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        params["correct_output_scale"] = jnp.zeros(
            (self.config.hidden_size,), self.param_dtype)
        return params

    def _modalities(self, params, x):
        r = self.router_norm(params["router_norm"], x) * (self.config.hidden_size ** -1.0)
        return jnp.tanh(self.modality_router(params["modality_router"], r)
                        .astype(jnp.float32)).astype(x.dtype)

    def predict(self, params, hidden):  # hidden [N, B, S, H]
        n = self.config.altup_num_inputs
        mod = self._modalities(params, hidden[self.config.altup_active_idx])
        coefs = self.prediction_coefs(params["prediction_coefs"], mod)
        coefs = coefs.reshape(*mod.shape[:-1], n, n)
        coefs = jnp.swapaxes(coefs, -1, -2)
        pred = jnp.einsum("nbsh,bsnm->mbsh", hidden, coefs)
        return (pred + hidden).astype(hidden.dtype)

    def correct(self, params, predictions, activated):
        n = self.config.altup_num_inputs
        mod = self._modalities(params, activated)
        innovation = activated - predictions[self.config.altup_active_idx]
        coefs = self.correction_coefs(params["correction_coefs"], mod) + 1.0  # [B,S,N]
        corrected = innovation[None] * jnp.moveaxis(coefs, -1, 0)[..., None]
        return (corrected + predictions).astype(activated.dtype)

    def scale_corrected_output(self, params, corrected):
        return (corrected.astype(jnp.float32)
                * params["correct_output_scale"].astype(jnp.float32)).astype(corrected.dtype)


class Gemma3nTextAttention(Module):
    """Unit-scale attention with q/k/v head norms and KV sharing (:1267)."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = config.num_key_value_heads
        self.head_dim = config.head_dim
        self.is_sliding = config.layer_types[layer_idx] == "sliding_attention"
        self.sliding_window = config.sliding_window if self.is_sliding else None
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.q_proj = Linear(h, self.num_heads * self.head_dim, config.attention_bias, **kw)
        self.k_proj = Linear(h, self.num_kv_heads * self.head_dim, config.attention_bias, **kw)
        self.v_proj = Linear(h, self.num_kv_heads * self.head_dim, config.attention_bias, **kw)
        self.o_proj = Linear(self.num_heads * self.head_dim, h, config.attention_bias, **kw)
        nkw = dict(dtype=dtype, param_dtype=param_dtype)
        self.q_norm = Gemma3nRMSNorm(self.head_dim, config.rms_norm_eps, **nkw)
        self.k_norm = Gemma3nRMSNorm(self.head_dim, config.rms_norm_eps, **nkw)
        self.v_norm = Gemma3nRMSNorm(self.head_dim, config.rms_norm_eps,
                                     with_scale=False, **nkw)
        first_shared = config.num_hidden_layers - config.num_kv_shared_layers
        self.is_kv_shared_layer = layer_idx >= first_shared > 0
        prev = config.layer_types[:first_shared]
        if self.is_kv_shared_layer:
            self.kv_shared_layer_index = (len(prev) - 1
                                          - prev[::-1].index(config.layer_types[layer_idx]))
        else:
            self.kv_shared_layer_index = None

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position,
                 kv_registry=None):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        q = self.q_norm(params["q_norm"], q)
        q, _ = apply_rotary_pos_emb(q, q, cos, sin)

        kwargs = dict(attn_args)
        kwargs["sliding_window"] = self.sliding_window

        use_shared = self.is_kv_shared_layer
        if not use_shared:
            k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_kv_heads, self.head_dim)
            k = self.k_norm(params["k_norm"], k)
            k, _ = apply_rotary_pos_emb(k, k, cos, sin)
            v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_kv_heads, self.head_dim)
            v = self.v_norm(params["v_norm"], v)
            if kv_registry is not None:
                kv_registry[self.layer_idx] = (k, v)

        if cache is None:
            if use_shared:
                k, v = kv_registry[self.kv_shared_layer_index]
            out = eager_attention(q, k, v, scale=1.0, **kwargs)
        else:
            read_idx = self.kv_shared_layer_index if use_shared else self.layer_idx
            if not use_shared:
                cache = cache.update(self.layer_idx, k, v, cache_position)
            k_full, v_full = cache.layer(read_idx)
            if self.sliding_window is not None and k_full.shape[1] < kwargs["kv_valid"].shape[1]:
                kwargs = dict(kwargs)
                kwargs["kv_valid"] = kwargs["kv_valid"][:, -k_full.shape[1]:]
            out = eager_attention(q, k_full.astype(self.dtype),
                                  v_full.astype(self.dtype), scale=1.0, **kwargs)
        out = out.reshape(b, s, self.num_heads * self.head_dim)
        return self.o_proj(params["o_proj"], out), cache


class Gemma3nTextDecoderLayer(Module):
    """reference :1386 — AltUp-wrapped block."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        kw2 = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        self.self_attn = Gemma3nTextAttention(config, layer_idx, **kw)
        self.mlp = Gemma3nTextMLP(config, layer_idx, **kw)
        h = config.hidden_size
        self.input_layernorm = Gemma3nRMSNorm(h, config.rms_norm_eps, **kw)
        self.post_attention_layernorm = Gemma3nRMSNorm(h, config.rms_norm_eps, **kw)
        self.pre_feedforward_layernorm = Gemma3nRMSNorm(h, config.rms_norm_eps, **kw)
        self.post_feedforward_layernorm = Gemma3nRMSNorm(h, config.rms_norm_eps, **kw)
        self.altup = Gemma3nTextAltUp(config, **kw)
        self.laurel = Gemma3nTextLaurelBlock(config, **kw)
        self.per_layer_input_gate = Linear(h, config.hidden_size_per_layer_input, False, **kw2)
        self.per_layer_projection = Linear(config.hidden_size_per_layer_input, h, False, **kw2)
        self.post_per_layer_input_norm = Gemma3nRMSNorm(h, config.rms_norm_eps, **kw)
        self.act = get_activation(config.hidden_activation)

    def __call__(self, params, hidden, rope_global, rope_local, per_layer_input,
                 attn_args, cache, cache_position, kv_registry=None):
        predictions = self.altup.predict(params["altup"], hidden)
        active = predictions[self.config.altup_active_idx]
        active_normed = self.input_layernorm(params["input_layernorm"], active)
        laurel_out = self.laurel(params["laurel"], active_normed)
        cos, sin = rope_local if self.self_attn.is_sliding else rope_global
        attn, cache = self.self_attn(params["self_attn"], active_normed, cos, sin,
                                     attn_args, cache, cache_position, kv_registry)
        attn = self.post_attention_layernorm(params["post_attention_layernorm"], attn)
        attn_gated = active + attn
        attn_laurel = (attn_gated + laurel_out) / math.sqrt(2)
        ffw = self.mlp(params["mlp"],
                       self.pre_feedforward_layernorm(params["pre_feedforward_layernorm"],
                                                      attn_laurel))
        ffw = self.post_feedforward_layernorm(params["post_feedforward_layernorm"], ffw)
        activated = attn_laurel + ffw
        corrected = self.altup.correct(params["altup"], predictions, activated)
        first = corrected[self.config.altup_active_idx]
        if self.config.altup_correct_scale:
            first = self.altup.scale_corrected_output(params["altup"], first)
        first = self.per_layer_input_gate(params["per_layer_input_gate"], first)
        first = self.act(first) * per_layer_input
        first = self.per_layer_projection(params["per_layer_projection"], first)
        first = self.post_per_layer_input_norm(params["post_per_layer_input_norm"], first)
        corrected = corrected.at[1:].add(first)
        return corrected, cache


class Gemma3nPreTrainedModel(PreTrainedModel):
    config_class = Gemma3nTextConfig
    base_model_prefix = "model"


class Gemma3nTextModel(Gemma3nPreTrainedModel):
    """reference :1509."""

    def __init__(self, config: Gemma3nTextConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ekw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                   embedding_init=normal_init(config.initializer_range))
        kw2 = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.embed_tokens = Embedding(config.vocab_size, h, **ekw)
        self.layers = [Gemma3nTextDecoderLayer(config, i, **kw)
                       for i in range(config.num_hidden_layers)]
        self.norm = Gemma3nRMSNorm(h, config.rms_norm_eps, **kw)
        self.embed_tokens_per_layer = Embedding(
            config.vocab_size_per_layer_input,
            config.num_hidden_layers * config.hidden_size_per_layer_input, **ekw)
        self.per_layer_model_projection = Linear(
            h, config.num_hidden_layers * config.hidden_size_per_layer_input, False, **kw2)
        self.per_layer_projection_norm = Gemma3nRMSNorm(
            config.hidden_size_per_layer_input, config.rms_norm_eps, **kw)
        self.altup_projections = [Linear(h, h, False, **kw2)
                                  for _ in range(config.altup_num_inputs - 1)]
        self.altup_unembed_projections = [Linear(h, h, False, **kw2)
                                          for _ in range(config.altup_num_inputs - 1)]
        self.inv_freq, self.attention_scaling = rope_inv_freq(config)
        import copy

        local_cfg = copy.copy(config)
        local_cfg.rope_theta = config.rope_local_base_freq
        local_cfg.rope_scaling = None
        self.inv_freq_local, _ = rope_inv_freq(local_cfg)

    def get_per_layer_inputs(self, params, input_ids):
        c = self.config
        emb = self.embed_tokens_per_layer(params["embed_tokens_per_layer"], input_ids)
        emb = emb * jnp.asarray(c.hidden_size_per_layer_input ** 0.5, self.dtype)
        return emb.reshape(*input_ids.shape, c.num_hidden_layers,
                           c.hidden_size_per_layer_input)

    def project_per_layer_inputs(self, params, inputs_embeds, per_layer_inputs):
        c = self.config
        proj = self.per_layer_model_projection(params["per_layer_model_projection"],
                                               inputs_embeds)
        proj = proj * jnp.asarray(c.hidden_size ** -0.5, self.dtype)
        proj = proj.reshape(*inputs_embeds.shape[:-1], c.num_hidden_layers,
                            c.hidden_size_per_layer_input)
        proj = self.per_layer_projection_norm(params["per_layer_projection_norm"], proj)
        if per_layer_inputs is None:
            return proj
        return (proj + per_layer_inputs) * jnp.asarray(2.0 ** -0.5, self.dtype)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values: Optional[StaticKVCache] = None, cache_position=0,
                 inputs_embeds=None, per_layer_inputs=None,
                 output_hidden_states=False, **kwargs) -> BaseModelOutputWithPast:
        c = self.config
        if input_ids is not None:
            inputs_embeds = self.embed_tokens(params["embed_tokens"], input_ids) \
                * jnp.asarray(c.hidden_size ** 0.5, self.dtype)
            per_layer_inputs = self.get_per_layer_inputs(params, input_ids)
        per_layer_inputs = self.project_per_layer_inputs(params, inputs_embeds,
                                                         per_layer_inputs)
        b, s, _ = inputs_embeds.shape
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None] + \
                jnp.asarray(cache_position, jnp.int32)
            position_ids = jnp.broadcast_to(position_ids, (b, s))
        rope_global = compute_cos_sin(position_ids, self.inv_freq,
                                      self.attention_scaling, dtype=self.dtype)
        rope_local = compute_cos_sin(position_ids, self.inv_freq_local, 1.0,
                                     dtype=self.dtype)

        kv_len = past_key_values.max_len if past_key_values is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid,
                     "is_causal": True, "sliding_window": None}

        h0 = inputs_embeds
        target_mag = jnp.sqrt(jnp.mean(h0.astype(jnp.float32) ** 2, axis=-1,
                                       keepdims=True))
        streams = [h0]
        for i in range(1, c.altup_num_inputs):
            proj = self.altup_projections[i - 1](
                params["altup_projections"][str(i - 1)], h0).astype(jnp.float32)
            mag = jnp.sqrt(jnp.maximum(jnp.mean(proj ** 2, axis=-1, keepdims=True), 1e-5))
            streams.append((proj * target_mag / mag).astype(h0.dtype))
        hidden = jnp.stack(streams, axis=0)  # [N, B, S, H]

        all_hidden = [] if output_hidden_states else None
        cache = past_key_values
        kv_registry: dict = {}
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden[c.altup_active_idx])
            hidden, cache = layer(params["layers"][str(i)], hidden, rope_global,
                                  rope_local, per_layer_inputs[:, :, i, :],
                                  attn_args, cache, cache_position, kv_registry)

        # unembed: mean of (active, rescaled unembed projections) then norm
        h0 = hidden[0]
        target_mag = jnp.sqrt(jnp.mean(h0.astype(jnp.float32) ** 2, axis=-1,
                                       keepdims=True))
        outs = [h0]
        for i in range(1, c.altup_num_inputs):
            proj = self.altup_unembed_projections[i - 1](
                params["altup_unembed_projections"][str(i - 1)], hidden[i]).astype(jnp.float32)
            mag = jnp.sqrt(jnp.maximum(jnp.mean(proj ** 2, axis=-1, keepdims=True), 1e-5))
            outs.append((proj * target_mag / mag).astype(h0.dtype))
        final = jnp.mean(jnp.stack(outs, axis=0), axis=0)
        final = self.norm(params["norm"], final)
        if output_hidden_states:
            all_hidden.append(final)
        return BaseModelOutputWithPast(
            last_hidden_state=final, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class Gemma3nForCausalLM(Gemma3nPreTrainedModel, GenerationMixin):
    """reference :1757 — tied lm head + final tanh softcap."""

    # 4.57-era checkpoints save the text stack under model.language_model
    from ...core.loading import WeightRule as _WR

    _weight_rules = (
        # 4.57's save-side BC remap garbles this key ("model" ->
        # "model.language_model" hits the substring in per_layer_model_projection)
        _WR(pattern=r"^model\.language_model\.per_layer_model\.language_model_projection\.",
            rename="model.per_layer_model_projection."),
        _WR(pattern=r"^model\.language_model\.", rename="model."),
    )

    def __init__(self, config: Gemma3nTextConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = Gemma3nTextModel(config, dtype=self.dtype,
                                      param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "model.embed_tokens.weight"

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 labels=None, logits_to_keep: int = 0, output_hidden_states=False,
                 **kwargs) -> CausalLMOutputWithPast:
        outputs = self.model(params["model"], input_ids, attention_mask, position_ids,
                             past_key_values, cache_position, inputs_embeds,
                             output_hidden_states=output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.model.embed_tokens.attend(
            params["model"]["embed_tokens"], hidden)
        cap = self.config.final_logit_softcapping
        if cap is not None:
            logits = jnp.tanh(logits / cap) * cap
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      past_key_values=outputs.past_key_values,
                                      hidden_states=outputs.hidden_states)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        cfg = self.config
        windows = [cfg.sliding_window if t == "sliding_attention" else None
                   for t in cfg.layer_types]
        return init_static_cache(
            num_layers=cfg.num_hidden_layers, batch_size=batch_size, max_len=max_len,
            num_kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
            dtype=dtype or self.dtype, layer_windows=tuple(windows))
