"""RecurrentGemma (Griffin), TPU-native (reference
src/transformers/models/recurrent_gemma/modeling_recurrent_gemma.py).

Hybrid of RG-LRU recurrent blocks (depthwise causal conv + block-diagonal
gates + diagonal linear recurrence) and sliding-window GQA attention, on a
2:1 recurrent:attention pattern.  The linear recurrence h_t = a_t·h_{t-1} +
x_t runs as a jax.lax.associative_scan (log-depth parallel scan — the
TPU-native formulation) in fp32; decode updates are O(1) carried in the
shared HybridCache pytree alongside the attention KV buffers.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp

from ...cache_utils import HybridCache, init_hybrid_cache
from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.rope import compute_cos_sin
from ..llama.modeling_llama import LlamaAttention
from .configuration_recurrent_gemma import RecurrentGemmaConfig


class RecurrentGemmaAttention(LlamaAttention):
    """Sliding-window GQA; o_proj has a bias, q/k/v follow attention_bias,
    FULL-dim rotary (reference RecurrentGemmaAttention)."""

    def build_projections(self, config, qkv_bias, o_bias, kw):
        super().build_projections(config, qkv_bias, True, kw)


class RecurrentGemmaRglru(Module):
    """Real-Gated LRU (reference RecurrentGemmaRglru)."""

    def __init__(self, config: RecurrentGemmaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.lru_width = config.lru_width
        self.block_width = config.lru_width // self.num_heads

    def init(self, rng):
        h, w = self.num_heads, self.block_width
        k1, k2, k3 = jax.random.split(rng, 3)
        std = (0.01 / w) ** 0.5
        rp = jax.random.uniform(k3, (self.lru_width,), jnp.float32,
                                0.9**2 + 1e-8, 0.999**2 + 1e-8)
        rp = jnp.log(jnp.exp(-0.5 * jnp.log(rp)) - 1.0)
        return {"recurrent_param": rp.astype(self.param_dtype),
                "input_gate_weight": (jax.random.normal(k1, (h, w, w)) * std).astype(self.param_dtype),
                "input_gate_bias": jnp.zeros((h, w), self.param_dtype),
                "recurrent_gate_weight": (jax.random.normal(k2, (h, w, w)) * std).astype(self.param_dtype),
                "recurrent_gate_bias": jnp.zeros((h, w), self.param_dtype)}

    def __call__(self, params, x, position_ids, recurrent_state):
        """x: [b, s, lru_width]; recurrent_state: [b, lru_width] fp32 or None."""
        b, s, d = x.shape
        reset = (position_ids == 0)[..., None]                        # [b, s, 1]
        xh = x.reshape(b, s, self.num_heads, self.block_width)
        ig = jax.nn.sigmoid(
            jnp.einsum("bshw,hwk->bshk", xh,
                       params["input_gate_weight"].astype(self.dtype))
            + params["input_gate_bias"].astype(self.dtype)).reshape(b, s, d)
        rg = jax.nn.sigmoid(
            jnp.einsum("bshw,hwk->bshk", xh,
                       params["recurrent_gate_weight"].astype(self.dtype))
            + params["recurrent_gate_bias"].astype(self.dtype)).reshape(b, s, d)
        log_a = -8.0 * rg * jax.nn.softplus(
            params["recurrent_param"].astype(self.dtype))[None, None]
        a = jnp.exp(log_a)
        a_square = jnp.exp(2.0 * log_a)
        gated = x * ig
        multiplier = jnp.where(reset, 1.0, jnp.sqrt(1.0 - a_square))
        normalized = (gated * multiplier).astype(jnp.float32)
        a = (a * ~reset).astype(jnp.float32)

        if s == 1:
            prev = (jnp.zeros((b, d), jnp.float32)
                    if recurrent_state is None else recurrent_state)
            h = a[:, 0] * prev + normalized[:, 0]
            return h[:, None].astype(x.dtype), h
        if recurrent_state is not None:
            normalized = normalized.at[:, 0].add(a[:, 0] * recurrent_state)
        # associative linear recurrence: (a1,x1)∘(a2,x2) = (a1a2, a2·x1+x2)
        def combine(c1, c2):
            a1, x1 = c1
            a2, x2 = c2
            return a1 * a2, a2 * x1 + x2

        _, h = jax.lax.associative_scan(combine, (a, normalized), axis=1)
        return h.astype(x.dtype), h[:, -1]


class RecurrentGemmaRecurrentBlock(Module):
    """Griffin recurrent block (reference RecurrentGemmaRecurrentBlock):
    gelu(y-branch) ⊙ RG-LRU(causal-conv(x-branch))."""

    def __init__(self, config: RecurrentGemmaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.lru_width = config.lru_width
        self.conv_width = config.conv1d_width
        self.linear_y = Linear(config.hidden_size, config.lru_width, True, **kw)
        self.linear_x = Linear(config.hidden_size, config.lru_width, True, **kw)
        self.linear_out = Linear(config.lru_width, config.hidden_size, True, **kw)
        self.rg_lru = RecurrentGemmaRglru(config, dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.hidden_activation)

    def init(self, rng):
        params = super().init(rng)
        std = (0.01 / self.conv_width) ** 0.5
        k1, k2 = jax.random.split(rng)
        params["conv_1d"] = {
            "weight": (jax.random.normal(k1, (self.lru_width, 1, self.conv_width))
                       * std).astype(self.param_dtype),
            "bias": jnp.zeros((self.lru_width,), self.param_dtype)}
        return params

    def __call__(self, params, hidden, position_ids, layer_idx,
                 cache: Optional[HybridCache]):
        b, s, _ = hidden.shape
        y = self.act(self.linear_y(params["linear_y"], hidden))
        x = self.linear_x(params["linear_x"], hidden)          # [b, s, d]
        w = params["conv_1d"]["weight"].astype(self.dtype)     # [d, 1, K]
        bias = params["conv_1d"]["bias"].astype(self.dtype)
        K = self.conv_width
        conv_state = cache.conv_states[layer_idx] if cache is not None else None
        rnn_state = (cache.ssm_states[layer_idx].astype(jnp.float32)
                     if cache is not None and cache.initialized else None)

        if cache is not None and cache.initialized:
            # O(1) decode step: x [b, 1, d]
            window = jnp.concatenate(
                [conv_state.astype(self.dtype), jnp.swapaxes(x, 1, 2)], axis=-1)
            conv_out = (window * w[None, :, 0]).sum(-1) + bias
            conv_out = conv_out[:, None]                        # [b, 1, d]
            new_conv = window[..., 1:]
        else:
            xt = jnp.swapaxes(x, 1, 2)                          # [b, d, s]
            padded = jnp.pad(xt, ((0, 0), (0, 0), (K - 1, 0)))
            conv = jax.lax.conv_general_dilated(
                padded.astype(self.dtype), w, (1,), "VALID",
                dimension_numbers=("NCW", "OIW", "NCW"),
                feature_group_count=self.lru_width)
            conv_out = jnp.swapaxes(conv + bias[None, :, None], 1, 2)
            # keep the last K-1 inputs for decode (reference conv1d_state)
            new_conv = jnp.pad(xt, ((0, 0), (0, 0), (max(K - 1 - s, 0), 0)))[..., -(K - 1):]
        out, new_rnn = self.rg_lru(params["rg_lru"], conv_out, position_ids, rnn_state)
        hidden = self.linear_out(params["linear_out"], out * y)
        if cache is not None:
            cache = replace(
                cache,
                conv_states=cache.conv_states[:layer_idx]
                + (new_conv.astype(cache.conv_states[layer_idx].dtype),)
                + cache.conv_states[layer_idx + 1:],
                ssm_states=cache.ssm_states[:layer_idx]
                + (new_rnn.astype(cache.ssm_states[layer_idx].dtype),)
                + cache.ssm_states[layer_idx + 1:])
        return hidden, cache


class RecurrentGemmaMlp(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        inter = config.intermediate_size // 2
        self.gate_proj = Linear(config.hidden_size, inter, True, **kw)
        self.up_proj = Linear(config.hidden_size, inter, True, **kw)
        self.down_proj = Linear(inter, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_activation)

    def __call__(self, params, x):
        gate = self.act(self.gate_proj(params["gate_proj"], x))
        return self.down_proj(params["down_proj"],
                              gate * self.up_proj(params["up_proj"], x))


class RecurrentGemmaDecoderLayer(Module):
    def __init__(self, config, layer_idx, block_type, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.block_type = block_type
        self.layer_idx = layer_idx
        self.temporal_pre_norm = RMSNorm(config.hidden_size, config.rms_norm_eps,
                                         scale_offset=1.0, **kw)
        self.channel_pre_norm = RMSNorm(config.hidden_size, config.rms_norm_eps,
                                        scale_offset=1.0, **kw)
        if block_type == "attention":
            self.temporal_block = RecurrentGemmaAttention(config, layer_idx, **kw)
        else:
            self.temporal_block = RecurrentGemmaRecurrentBlock(config, **kw)
        self.mlp_block = RecurrentGemmaMlp(config, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, position_ids,
                 cache, cache_position):
        raw = hidden
        h = self.temporal_pre_norm(params["temporal_pre_norm"], hidden)
        if self.block_type == "attention":
            h, cache = self.temporal_block(params["temporal_block"], h, cos, sin,
                                           attn_args, cache, cache_position)
        else:
            h, cache = self.temporal_block(params["temporal_block"], h,
                                           position_ids, self.layer_idx, cache)
        residual = h + raw
        h = self.channel_pre_norm(params["channel_pre_norm"], residual)
        h = self.mlp_block(params["mlp_block"], h)
        return h + residual, cache


class RecurrentGemmaModel(Module):
    def __init__(self, config: RecurrentGemmaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size,
                                      embedding_init=normal_init(config.initializer_range), **kw)
        self.layers = [RecurrentGemmaDecoderLayer(
            config, i, config.layers_block_type[i], **kw)
            for i in range(config.num_hidden_layers)]
        self.final_norm = RMSNorm(config.hidden_size, config.rms_norm_eps,
                                  scale_offset=1.0, **kw)
        from ...ops.rope import rope_inv_freq

        self.inv_freq, self.attention_scaling = rope_inv_freq(config)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 position_ids=None, past_key_values: Optional[HybridCache] = None,
                 cache_position=0, inputs_embeds=None,
                 output_hidden_states=False) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(params["embed_tokens"], input_ids)
        hidden = inputs_embeds
        b, s, _ = hidden.shape
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :] \
                + jnp.asarray(cache_position, jnp.int32)
            position_ids = jnp.broadcast_to(position_ids, (b, s))
        cos, sin = compute_cos_sin(position_ids, self.inv_freq, self.attention_scaling,
                                   dtype=self.dtype)
        kv_len = past_key_values.max_len if past_key_values is not None else s
        kv_valid = (attention_mask if attention_mask is not None
                    else jnp.ones((b, kv_len), jnp.int32))
        attn_args = {"q_positions": position_ids, "kv_valid": kv_valid,
                     "is_causal": True}
        # the reference normalizer buffer is stored in bfloat16
        normalizer = jnp.asarray(self.config.hidden_size**0.5, jnp.bfloat16)
        hidden = hidden * normalizer.astype(hidden.dtype)
        all_hidden = [] if output_hidden_states else None
        cache = past_key_values
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, cache = layer(params["layers"][str(i)], hidden, cos, sin,
                                  attn_args, position_ids, cache, cache_position)
        hidden = self.final_norm(params["final_norm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        if cache is not None and not cache.initialized:
            cache = replace(cache, initialized=True)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class RecurrentGemmaPreTrainedModel(PreTrainedModel):
    config_class = RecurrentGemmaConfig
    base_model_prefix = "model"


class RecurrentGemmaForCausalLM(RecurrentGemmaPreTrainedModel, GenerationMixin):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = RecurrentGemmaModel(config, dtype=self.dtype,
                                         param_dtype=self.param_dtype)
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.hidden_size, config.vocab_size, False,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  kernel_init=normal_init(config.initializer_range))

    def get_input_embedding_path(self):
        return "model.embed_tokens.weight"

    def __call__(self, params, input_ids=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        outputs = self.model(params["model"], input_ids, attention_mask,
                             position_ids, past_key_values, cache_position,
                             inputs_embeds, output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        if self.config.tie_word_embeddings:
            logits = self.model.embed_tokens.attend(
                params["model"]["embed_tokens"], hidden)
        else:
            logits = self.lm_head(params["lm_head"], hidden)
        cap = self.config.logits_soft_cap
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
        c = self.config
        return init_hybrid_cache(
            batch_size=batch_size, max_len=max_len, dtype=dtype or self.dtype,
            block_types=["attention" if t == "attention" else "recurrent"
                         for t in c.layers_block_type],
            num_kv_heads=c.num_key_value_heads, head_dim=c.head_dim,
            conv_shape=(c.lru_width, c.conv1d_width - 1),
            ssm_shape=(c.lru_width,),
            layer_windows=tuple(
                c.attention_window_size if t == "attention" else None
                for t in c.layers_block_type))


class RecurrentGemmaModelStandalone(RecurrentGemmaPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = RecurrentGemmaModel(config, dtype=self.dtype,
                                         param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.model(params["model"], *args, **kwargs)
