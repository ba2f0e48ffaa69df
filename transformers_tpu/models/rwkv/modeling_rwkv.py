"""RWKV v4, TPU-native (reference src/transformers/models/rwkv/modeling_rwkv.py).

Attention-free RNN language model: per-block time-mix (WKV linear attention
with a log-sum-exp-stabilized decaying state) and channel-mix (squared-relu
FF with token shift).  The WKV recurrence runs as a jax.lax.scan in fp32 —
elementwise state math, no attention matrices — and decode carries the
5-tensor recurrent state per layer in an O(1) RwkvCache pytree.  Inference
weight rescaling (reference _rescale_layers: out-projection weights divided
by 2^(layer//rescale_every), hidden halved at each boundary) is applied
functionally at forward time.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from .configuration_rwkv import RwkvConfig


@partial(jax.tree_util.register_dataclass,
         data_fields=["ffn_shift", "attn_shift", "num", "den", "mx"],
         meta_fields=["initialized"])
@dataclass
class RwkvCache:
    """Per-layer recurrent state (reference RwkvModel state list):
    last-token shifts for the two mixes + stabilized WKV (num, den, max)."""

    ffn_shift: tuple   # [B, H] per layer
    attn_shift: tuple  # [B, H]
    num: tuple         # [B, A] fp32
    den: tuple
    mx: tuple
    initialized: bool = False

    max_len = None


def wkv_scan(time_decay, time_first, key, value, state):
    """Stabilized WKV recurrence (reference rwkv_linear_attention_cpu).

    key/value [B, S, A] fp32; state (num, den, mx) [B, A] fp32.
    """
    decay = -jnp.exp(time_decay)

    def step(carry, kv):
        num, den, mx = carry
        k, v = kv
        max_out = jnp.maximum(mx, k + time_first)
        e1 = jnp.exp(mx - max_out)
        e2 = jnp.exp(k + time_first - max_out)
        out = (e1 * num + e2 * v) / (e1 * den + e2)
        max_state = jnp.maximum(mx + decay, k)
        e1 = jnp.exp(mx + decay - max_state)
        e2 = jnp.exp(k - max_state)
        return (e1 * num + e2 * v, e1 * den + e2, max_state), out

    (num, den, mx), out = jax.lax.scan(
        step, state, (key.swapaxes(0, 1), value.swapaxes(0, 1)))
    return out.swapaxes(0, 1), (num, den, mx)


class RwkvSelfAttention(Module):
    """Time-mix block (reference RwkvSelfAttention)."""

    def __init__(self, config: RwkvConfig, layer_id, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer_id = layer_id
        h, a = config.hidden_size, config.attention_hidden_size
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.hidden_size = h
        self.att_size = a
        self.key = Linear(h, a, False, **kw)
        self.value = Linear(h, a, False, **kw)
        self.receptance = Linear(h, a, False, **kw)
        self.output = Linear(a, h, False, **kw)

    def init(self, rng):
        params = super().init(rng)
        h, a = self.hidden_size, self.att_size
        params["time_decay"] = jnp.zeros((a,), self.param_dtype)
        params["time_first"] = jnp.zeros((a,), self.param_dtype)
        params["time_mix_key"] = jnp.full((1, 1, h), 0.5, self.param_dtype)
        params["time_mix_value"] = jnp.full((1, 1, h), 0.5, self.param_dtype)
        params["time_mix_receptance"] = jnp.full((1, 1, h), 0.5, self.param_dtype)
        return params

    def __call__(self, params, hidden, cache: Optional[RwkvCache], out_scale):
        b, s, h = hidden.shape
        i = self.layer_id
        if cache is not None and cache.initialized:
            shifted = cache.attn_shift[i][:, None].astype(hidden.dtype)
        else:
            shifted = jnp.pad(hidden, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        mk = params["time_mix_key"].astype(hidden.dtype)
        mv = params["time_mix_value"].astype(hidden.dtype)
        mr = params["time_mix_receptance"].astype(hidden.dtype)
        key = self.key(params["key"], hidden * mk + shifted * (1 - mk))
        value = self.value(params["value"], hidden * mv + shifted * (1 - mv))
        receptance = jax.nn.sigmoid(
            self.receptance(params["receptance"], hidden * mr + shifted * (1 - mr)))

        if cache is not None and cache.initialized:
            state = (cache.num[i], cache.den[i], cache.mx[i])
        else:
            z = jnp.zeros((b, self.att_size), jnp.float32)
            state = (z, z, z - 1e38)
        rwkv, state = wkv_scan(
            params["time_decay"].astype(jnp.float32),
            params["time_first"].astype(jnp.float32),
            key.astype(jnp.float32), value.astype(jnp.float32), state)
        out = self.output(params["output"],
                          receptance * rwkv.astype(hidden.dtype)) * out_scale
        if cache is not None:
            cache = replace(
                cache,
                attn_shift=cache.attn_shift[:i] + (hidden[:, -1],)
                + cache.attn_shift[i + 1:],
                num=cache.num[:i] + (state[0],) + cache.num[i + 1:],
                den=cache.den[:i] + (state[1],) + cache.den[i + 1:],
                mx=cache.mx[:i] + (state[2],) + cache.mx[i + 1:])
        return out, cache


class RwkvFeedForward(Module):
    """Channel-mix block (reference RwkvFeedForward)."""

    def __init__(self, config: RwkvConfig, layer_id, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer_id = layer_id
        h, inter = config.hidden_size, config.intermediate_size
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.hidden_size = h
        self.key = Linear(h, inter, False, **kw)
        self.receptance = Linear(h, h, False, **kw)
        self.value = Linear(inter, h, False, **kw)

    def init(self, rng):
        params = super().init(rng)
        h = self.hidden_size
        params["time_mix_key"] = jnp.full((1, 1, h), 0.5, self.param_dtype)
        params["time_mix_receptance"] = jnp.full((1, 1, h), 0.5, self.param_dtype)
        return params

    def __call__(self, params, hidden, cache: Optional[RwkvCache], out_scale):
        i = self.layer_id
        if cache is not None and cache.initialized:
            shifted = cache.ffn_shift[i][:, None].astype(hidden.dtype)
        else:
            shifted = jnp.pad(hidden, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        mk = params["time_mix_key"].astype(hidden.dtype)
        mr = params["time_mix_receptance"].astype(hidden.dtype)
        key = jnp.square(jax.nn.relu(
            self.key(params["key"], hidden * mk + shifted * (1 - mk))))
        value = self.value(params["value"], key) * out_scale
        receptance = jax.nn.sigmoid(
            self.receptance(params["receptance"], hidden * mr + shifted * (1 - mr)))
        if cache is not None:
            cache = replace(cache, ffn_shift=cache.ffn_shift[:i] + (hidden[:, -1],)
                            + cache.ffn_shift[i + 1:])
        return receptance * value, cache


class RwkvBlock(Module):
    def __init__(self, config, layer_id, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layer_id = layer_id
        if layer_id == 0:
            self.pre_ln = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)
        self.ln1 = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)
        self.ln2 = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)
        self.attention = RwkvSelfAttention(config, layer_id, **kw)
        self.feed_forward = RwkvFeedForward(config, layer_id, **kw)

    def __call__(self, params, hidden, cache, out_scale):
        if self.layer_id == 0:
            hidden = self.pre_ln(params["pre_ln"], hidden)
        h, cache = self.attention(params["attention"],
                                  self.ln1(params["ln1"], hidden), cache, out_scale)
        hidden = hidden + h
        h, cache = self.feed_forward(params["feed_forward"],
                                     self.ln2(params["ln2"], hidden), cache, out_scale)
        return hidden + h, cache


class RwkvModel(Module):
    def __init__(self, config: RwkvConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = Embedding(config.vocab_size, config.hidden_size,
                                    embedding_init=normal_init(0.02), **kw)
        self.blocks = [RwkvBlock(config, i, **kw)
                       for i in range(config.num_hidden_layers)]
        self.ln_out = LayerNorm(config.hidden_size, 1e-5, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 position_ids=None, past_key_values: Optional[RwkvCache] = None,
                 cache_position=0, inputs_embeds=None,
                 output_hidden_states=False) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.embeddings(params["embeddings"], input_ids)
        hidden = inputs_embeds
        cache = past_key_values
        resc = self.config.rescale_every
        all_hidden = [] if output_hidden_states else None
        for i, block in enumerate(self.blocks):
            if output_hidden_states:
                all_hidden.append(hidden)
            # eval-mode weight rescaling, applied functionally
            out_scale = 2.0 ** -(i // resc) if resc > 0 else 1.0
            hidden, cache = block(params["blocks"][str(i)], hidden, cache, out_scale)
            if resc > 0 and (i + 1) % resc == 0:
                hidden = hidden / 2
        hidden = self.ln_out(params["ln_out"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        if cache is not None and not cache.initialized:
            cache = replace(cache, initialized=True)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class RwkvPreTrainedModel(PreTrainedModel):
    config_class = RwkvConfig
    base_model_prefix = "rwkv"


class RwkvForCausalLM(RwkvPreTrainedModel, GenerationMixin):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.rwkv = RwkvModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        if not config.tie_word_embeddings:
            self.head = Linear(config.hidden_size, config.vocab_size, False,
                               dtype=self.dtype, param_dtype=self.param_dtype,
                               kernel_init=normal_init(0.02))

    def get_input_embedding_path(self):
        return "rwkv.embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def __call__(self, params, input_ids=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        outputs = self.rwkv(params["rwkv"], input_ids, attention_mask,
                            position_ids, past_key_values, cache_position,
                            inputs_embeds, output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        if self.config.tie_word_embeddings:
            logits = self.rwkv.embeddings.attend(params["rwkv"]["embeddings"], hidden)
        else:
            logits = self.head(params["head"], hidden)
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
        dtype = dtype or self.dtype
        n = cfg.num_hidden_layers
        shift = tuple(jnp.zeros((batch_size, cfg.hidden_size), dtype) for _ in range(n))
        shift2 = tuple(jnp.zeros((batch_size, cfg.hidden_size), dtype) for _ in range(n))
        z = tuple(jnp.zeros((batch_size, cfg.attention_hidden_size), jnp.float32)
                  for _ in range(n))
        z2 = tuple(jnp.zeros((batch_size, cfg.attention_hidden_size), jnp.float32)
                   for _ in range(n))
        mx = tuple(jnp.full((batch_size, cfg.attention_hidden_size), -1e38, jnp.float32)
                   for _ in range(n))
        return RwkvCache(ffn_shift=shift, attn_shift=shift2, num=z, den=z2, mx=mx,
                         initialized=False)


class RwkvModelStandalone(RwkvPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.rwkv = RwkvModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.rwkv(params["rwkv"], *args, **kwargs)
