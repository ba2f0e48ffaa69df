"""Idefics v1 (reference models/idefics/modeling_idefics.py): Flamingo-style
VLM — a CLIP vision tower (optionally compressed by a perceiver resampler)
feeds gated tanh cross-attention layers interleaved every
``cross_layer_interval`` into a llama decoder. Embeddings/LM head are
"decoupled": an always-trainable additional vocab rides on top of the frozen
base vocab (reference IdeficsDecoupledEmbedding:168/IdeficsDecoupledLinear:273)."""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ...cache_utils import init_static_cache
from ...core.module import (
    Embedding,
    LayerNorm,
    Linear,
    Module,
    ModuleList,
    RMSNorm,
    normal_init,
)
from ...modeling_outputs import CausalLMOutputWithPast, ModelOutput
from ...modeling_utils import PreTrainedModel
from ...generation import GenerationMixin
from ...ops.rope import compute_cos_sin, rope_inv_freq
from ..clip.modeling_clip import CLIPVisionTransformer
from ..llama.modeling_llama import LlamaDecoderLayer, LlamaMLP
from .configuration_idefics import IdeficsConfig

NEG = float(jnp.finfo(jnp.float32).min)


@dataclass
class IdeficsBaseModelOutputWithPast(ModelOutput):
    last_hidden_state: Any = None
    past_key_values: Any = None
    image_hidden_states: Any = None


# --------------------------------------------------------------- embeddings


class IdeficsDecoupledEmbedding(Module):
    """reference :168 — base table + additional always-trainable rows for ids
    >= vocab_size."""

    def __init__(self, num_embeddings, num_additional, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.num_embeddings = num_embeddings
        self.num_additional = num_additional
        self.base = Embedding(num_embeddings, dim, embedding_init=normal_init(0.02), **kw)
        if num_additional > 0:
            self.additional_embedding = Embedding(
                num_additional, dim, embedding_init=normal_init(0.02), **kw)

    def init(self, rng):
        params = {"weight": self.base.init(rng)["weight"]}
        if self.num_additional > 0:
            params["additional_embedding"] = self.additional_embedding.init(rng)
        return params

    def __call__(self, params, input_ids):
        base = jnp.take(params["weight"].astype(self.dtype),
                        jnp.clip(input_ids, 0, self.num_embeddings - 1), axis=0)
        if self.num_additional == 0:
            return base
        extra_ids = jnp.clip(input_ids - self.num_embeddings, 0,
                             self.num_additional - 1)
        extra = jnp.take(params["additional_embedding"]["weight"].astype(self.dtype),
                         extra_ids, axis=0)
        return jnp.where((input_ids >= self.num_embeddings)[..., None], extra, base)


class IdeficsDecoupledLinear(Module):
    """reference :273 — base projection + concatenated additional features."""

    def __init__(self, in_features, out_features, out_additional, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.out_additional = out_additional
        self.base = Linear(in_features, out_features, use_bias=False, **kw)
        if out_additional > 0:
            self.additional_fc = Linear(in_features, out_additional, use_bias=False, **kw)

    def init(self, rng):
        params = {"weight": self.base.init(rng)["weight"]}
        if self.out_additional > 0:
            params["additional_fc"] = self.additional_fc.init(rng)
        return params

    # the flat "weight" leaf lives on THIS module (not a Linear child), so
    # the torch [out, in] <-> ours [in, out] transpose happens here
    def param_load_transform(self, name, arr):
        if name == "weight":
            import numpy as np

            return np.ascontiguousarray(arr.transpose())
        return arr

    def param_save_transform(self, name, arr):
        if name == "weight":
            return arr.T
        return arr

    def __call__(self, params, x):
        out = self.base(params, x)
        if self.out_additional > 0:
            out = jnp.concatenate(
                [out, self.additional_fc(params["additional_fc"], x)], -1)
        return out


# ---------------------------------------------------------------- perceiver


class IdeficsPerceiverAttention(Module):
    """reference perceiver.py:106 — latents query [context; latents]."""

    def __init__(self, embed_dim, n_heads, head_dim, qk_layer_norms, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.n_heads, self.head_dim = n_heads, head_dim
        self.qk_layer_norms = qk_layer_norms
        self.context_layer_norm = LayerNorm(embed_dim, 1e-5, **kw)
        self.latents_layer_norm = LayerNorm(embed_dim, 1e-5, **kw)
        if qk_layer_norms:
            self.q_layer_norm = LayerNorm(head_dim, 1e-5, **kw)
            self.k_layer_norm = LayerNorm(head_dim, 1e-5, **kw)
        self.q_proj = Linear(embed_dim, n_heads * head_dim, use_bias=False, **kw)
        self.k_proj = Linear(embed_dim, n_heads * head_dim, use_bias=False, **kw)
        self.v_proj = Linear(embed_dim, n_heads * head_dim, use_bias=False, **kw)
        self.output_proj = Linear(n_heads * head_dim, embed_dim, use_bias=False, **kw)

    def __call__(self, params, context, latents):
        context = self.context_layer_norm(params["context_layer_norm"], context)
        latents = self.latents_layer_norm(params["latents_layer_norm"], latents)
        b = context.shape[0]
        both = jnp.concatenate([context, latents], axis=-2)
        h, hd = self.n_heads, self.head_dim
        q = self.q_proj(params["q_proj"], latents).reshape(b, -1, h, hd)
        k = self.k_proj(params["k_proj"], both).reshape(b, -1, h, hd)
        v = self.v_proj(params["v_proj"], both).reshape(b, -1, h, hd)
        if self.qk_layer_norms:
            q = self.q_layer_norm(params["q_layer_norm"], q)
            k = self.k_layer_norm(params["k_layer_norm"], k)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, -1, h * hd)
        return self.output_proj(params["output_proj"], out)


class IdeficsPerceiverMLP(Module):
    """reference perceiver.py:171 — ln -> fc -> relu -> c_proj."""

    def __init__(self, intermediate, embed_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.ln = LayerNorm(embed_dim, 1e-5, **kw)
        self.fc = Linear(embed_dim, intermediate, use_bias=False, **kw)
        self.c_proj = Linear(intermediate, embed_dim, use_bias=False, **kw)

    def __call__(self, params, x):
        h = self.fc(params["fc"], self.ln(params["ln"], x))
        return self.c_proj(params["c_proj"], jax.nn.relu(h))


class IdeficsPerceiverResampler(Module):
    """reference perceiver.py:46."""

    def __init__(self, config: IdeficsConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        pc = config.perceiver_config
        embed_dim = config.vision_config.embed_dim
        self.embed_dim = embed_dim
        self.n_latents = pc.resampler_n_latents
        intermediate = embed_dim * 4
        self.blocks = [ModuleList([
            IdeficsPerceiverAttention(embed_dim, pc.resampler_n_heads,
                                      pc.resampler_head_dim,
                                      pc.qk_layer_norms_perceiver, **kw),
            IdeficsPerceiverMLP(intermediate, embed_dim, **kw)])
            for _ in range(pc.resampler_depth)]
        self.layer_norm = LayerNorm(embed_dim, 1e-5, **kw)
        self.depth = pc.resampler_depth

    def init(self, rng):
        params = super().init(rng)
        params["latents"] = jax.random.normal(
            rng, (self.n_latents, self.embed_dim), self.param_dtype)
        return params

    def __call__(self, params, context):
        latents = jnp.broadcast_to(
            params["latents"].astype(context.dtype)[None],
            (context.shape[0], self.n_latents, self.embed_dim))
        for i in range(self.depth):
            bp = params["blocks"][str(i)]
            latents = self.blocks[i][0](bp["0"], context, latents) + latents
            latents = self.blocks[i][1](bp["1"], latents) + latents
        return self.layer_norm(params["layer_norm"], latents)


# ------------------------------------------------------------- cross layers


class IdeficsCrossAttention(Module):
    """reference IdeficsAttention:474 in cross mode — no rope, optional
    per-head-dim RMS qk norms."""

    def __init__(self, config: IdeficsConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        kv_dim = config.vision_config.embed_dim
        self.num_heads = config.num_attention_heads
        self.head_dim = d // self.num_heads
        self.q_proj = Linear(d, d, use_bias=False, **kw)
        self.k_proj = Linear(kv_dim, d, use_bias=False, **kw)
        self.v_proj = Linear(kv_dim, d, use_bias=False, **kw)
        self.o_proj = Linear(d, d, use_bias=False, **kw)
        self.qk_layer_norms = config.qk_layer_norms
        if self.qk_layer_norms:
            self.q_layer_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)
            self.k_layer_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)

    def compute_kv(self, params, image_states):
        b, n, _ = image_states.shape
        k = self.k_proj(params["k_proj"], image_states).reshape(
            b, n, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], image_states).reshape(
            b, n, self.num_heads, self.head_dim)
        return k, v

    def __call__(self, params, hidden, k, v, bias):
        b, s, d = hidden.shape
        h, hd = self.num_heads, self.head_dim
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, h, hd)
        if self.qk_layer_norms:
            q = self.q_layer_norm(params["q_layer_norm"], q)
            k = self.k_layer_norm(params["k_layer_norm"], k)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd ** -0.5
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
        return self.o_proj(params["o_proj"], out)


class IdeficsGatedCrossAttentionLayer(Module):
    """reference :678 — tanh(alpha)-gated cross attention + gated MLP, with
    a per-token gate zeroing rows that attend to no image."""

    def __init__(self, config: IdeficsConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.alpha_type = config.alpha_type
        self.hidden_size = d
        self.cross_attn = IdeficsCrossAttention(config, **kw)
        self.mlp = LlamaMLP(config, **kw)
        self.input_layernorm = RMSNorm(d, config.rms_norm_eps, **kw)
        self.post_attention_layernorm = RMSNorm(d, config.rms_norm_eps, **kw)

    def init(self, rng):
        params = super().init(rng)
        shape = (1, 1, self.hidden_size) if self.alpha_type == "vector" else (1,)
        params["alpha_cross_attn"] = jnp.zeros(shape, self.param_dtype)
        params["alpha_dense"] = jnp.zeros(shape, self.param_dtype)
        return params

    def __call__(self, params, hidden, k, v, image_bias, gate_row):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h = self.cross_attn(params["cross_attn"], h, k, v, image_bias)
        if gate_row is not None:
            h = h * gate_row
        hidden = residual + jnp.tanh(
            params["alpha_cross_attn"].astype(h.dtype)) * h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        return residual + jnp.tanh(params["alpha_dense"].astype(h.dtype)) * h


# -------------------------------------------------------------------- model


@dataclass
class IdeficsCache:
    self_cache: Any
    cross_keys: tuple = ()
    cross_values: tuple = ()
    cross_bias_row: Any = None
    cross_gate_row: Any = None

    @property
    def max_len(self):
        return self.self_cache.max_len

    @property
    def has_cross(self):
        return len(self.cross_keys) > 0


jax.tree_util.register_pytree_node(
    IdeficsCache,
    lambda c: ((c.self_cache, c.cross_keys, c.cross_values, c.cross_bias_row,
                c.cross_gate_row), None),
    lambda aux, ch: IdeficsCache(*ch))


class IdeficsModel(Module):
    def __init__(self, config: IdeficsConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = IdeficsDecoupledEmbedding(
            config.vocab_size, config.additional_vocab_size,
            config.hidden_size, **kw)
        self.vision_model = CLIPVisionTransformer(config.vision_config, **kw)
        if config.use_resampler:
            self.perceiver_resampler = IdeficsPerceiverResampler(config, **kw)
        self.layers = [LlamaDecoderLayer(config, i, **kw)
                       for i in range(config.num_hidden_layers)]
        self.cross_layer_interval = config.cross_layer_interval
        self.gated_cross_attn_layers = [
            IdeficsGatedCrossAttentionLayer(config, **kw)
            for _ in range(config.num_hidden_layers // config.cross_layer_interval)]
        self.norm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.inv_freq, self.attention_scaling = rope_inv_freq(config)

    def image_states(self, params, pixel_values):
        """[B, M, C, H, W] -> [B, M*T, D] vision (or resampled) features."""
        b, m = pixel_values.shape[:2]
        flat = pixel_values.reshape((b * m,) + pixel_values.shape[2:])
        feats = self.vision_model(params["vision_model"], flat).last_hidden_state
        if self.config.use_resampler:
            feats = self.perceiver_resampler(params["perceiver_resampler"], feats)
        return feats.reshape(b, m * feats.shape[1], feats.shape[-1])

    @staticmethod
    def expand_image_mask(image_attention_mask, image_seq_len):
        """[B, T, M] (1 = token sees image m) -> additive bias [B,1,T,M*L]
        and the per-token any-image gate [B, T, 1] (reference :1016-1035)."""
        m = jnp.repeat(image_attention_mask.astype(jnp.float32), image_seq_len,
                       axis=2)
        bias = jnp.where(m[:, None].astype(bool), 0.0, NEG)
        gate = (bias == 0.0).any(axis=-1).astype(jnp.float32)  # [B, 1, T]
        gate = jnp.squeeze(gate, axis=1)[..., None]  # [B, T, 1]
        return bias, gate

    def __call__(self, params, input_ids=None, attention_mask=None,
                 position_ids=None, past_key_values: Optional[IdeficsCache] = None,
                 cache_position=0, inputs_embeds=None, pixel_values=None,
                 image_attention_mask=None, output_hidden_states=False):
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(params["embed_tokens"], input_ids)
        hidden = inputs_embeds
        b, s, _ = hidden.shape
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :] + \
                jnp.asarray(cache_position, jnp.int32)
            position_ids = jnp.broadcast_to(position_ids, (b, s))
        cos, sin = compute_cos_sin(position_ids, self.inv_freq,
                                   self.attention_scaling, dtype=self.dtype)

        image_hidden = None
        cross_bias = gate_row = None
        if pixel_values is not None:
            image_hidden = self.image_states(params, pixel_values)
            image_seq_len = image_hidden.shape[1] // pixel_values.shape[1]
            if image_attention_mask is None:
                image_attention_mask = jnp.ones(
                    (b, s, pixel_values.shape[1]), jnp.int32)
            cross_bias, gate_row = self.expand_image_mask(
                image_attention_mask, image_seq_len)
        elif past_key_values is not None and past_key_values.has_cross:
            cross_bias = past_key_values.cross_bias_row
            gate_row = past_key_values.cross_gate_row

        kv_len = past_key_values.max_len if past_key_values is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + \
            jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        kv_valid = attention_mask if attention_mask is not None \
            else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid,
                     "is_causal": True, "sliding_window": None}

        self_cache = past_key_values.self_cache if past_key_values is not None else None
        new_k, new_v = [], []
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            if i % self.cross_layer_interval == 0:
                ci = i // self.cross_layer_interval
                cl = self.gated_cross_attn_layers[ci]
                cp = params["gated_cross_attn_layers"][str(ci)]
                if image_hidden is not None:
                    k, v = cl.cross_attn.compute_kv(cp["cross_attn"], image_hidden)
                    if past_key_values is not None:
                        new_k.append(k)
                        new_v.append(v)
                    hidden = cl(cp, hidden, k, v, cross_bias, gate_row)
                elif past_key_values is not None and past_key_values.has_cross:
                    hidden = cl(cp, hidden,
                                past_key_values.cross_keys[ci].astype(self.dtype),
                                past_key_values.cross_values[ci].astype(self.dtype),
                                cross_bias, gate_row)
            hidden, self_cache = layer(params["layers"][str(i)], hidden, cos,
                                       sin, attn_args, self_cache, cache_position)
        hidden = self.norm(params["norm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)

        new_cache = None
        if past_key_values is not None:
            if image_hidden is not None:
                new_cache = IdeficsCache(
                    self_cache, tuple(new_k), tuple(new_v),
                    cross_bias[:, :, -1:, :] if cross_bias is not None else None,
                    gate_row[:, -1:, :] if gate_row is not None else None)
            else:
                new_cache = replace(past_key_values, self_cache=self_cache)
        return IdeficsBaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=new_cache,
            image_hidden_states=image_hidden)


class IdeficsPreTrainedModel(PreTrainedModel):
    config_class = IdeficsConfig
    base_model_prefix = "model"
    _keys_to_ignore_on_load_unexpected = (r".*position_ids$",)


class IdeficsForVisionText2Text(IdeficsPreTrainedModel, GenerationMixin):
    _prefill_input_names = ("pixel_values", "image_attention_mask")

    def __init__(self, config: IdeficsConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = IdeficsModel(config, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        self.lm_head = IdeficsDecoupledLinear(
            config.hidden_size, config.vocab_size,
            config.additional_vocab_size, dtype=self.dtype,
            param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "model.embed_tokens.weight"

    def __call__(self, params, input_ids=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, pixel_values=None,
                 image_attention_mask=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        out = self.model(params["model"], input_ids, attention_mask,
                         position_ids, past_key_values, cache_position,
                         inputs_embeds, pixel_values, image_attention_mask,
                         output_hidden_states)
        hidden = out.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        if self.config.tie_word_embeddings:
            # tied checkpoints strip lm_head: attend against the (decoupled)
            # embedding tables instead
            ep = params["model"]["embed_tokens"]
            logits = jnp.dot(hidden, ep["weight"].astype(hidden.dtype).T)
            if self.config.additional_vocab_size > 0:
                extra = jnp.dot(
                    hidden,
                    ep["additional_embedding"]["weight"].astype(hidden.dtype).T)
                logits = jnp.concatenate([logits, extra], -1)
        else:
            logits = self.lm_head(params["lm_head"], hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, logits.shape[-1])
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      past_key_values=out.past_key_values)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        c = self.config
        self_cache = init_static_cache(
            num_layers=c.num_hidden_layers, batch_size=batch_size,
            max_len=max_len, num_kv_heads=c.num_attention_heads,
            head_dim=c.hidden_size // c.num_attention_heads,
            dtype=dtype or self.dtype,
            layer_windows=(None,) * c.num_hidden_layers, layout="bhsd")
        return IdeficsCache(self_cache)
