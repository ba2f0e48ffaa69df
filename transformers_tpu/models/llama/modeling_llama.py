"""Llama decoder, TPU-native.

Semantics match reference src/transformers/models/llama/modeling_llama.py
(RMSNorm :53, rotary :73/:138, gated MLP :163, GQA attention :217-283,
DecoderLayer :284, Model :347, ForCausalLM :421) but the implementation is a
pure-function JAX module tree: BSHD attention layout, masks as data, static
KV cache updated functionally, float32 softmax/norms for numerical parity.

This file is the **decoder skeleton** other families parameterize (SURVEY
§A.3: 173 causal-LM architectures share this structure). Where the reference
uses its modular system (modular_*.py expanded by AST tooling), we use plain
class inheritance: subclasses swap ``attention_cls``/``mlp_cls``/
``decoder_layer_cls`` class attributes or override the config-driven knobs
(sliding windows, qk-norm, softcapping, biases) that this skeleton reads.
"""

from __future__ import annotations

from typing import Any, Optional

import os

import jax
import jax.numpy as jnp

from ...cache_utils import StaticKVCache, cache_from_config, layer_sliding_window
from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.attention import get_attention_fn
from ...ops.activations import get_activation
from ...ops.rope import apply_rotary_pos_emb, compute_cos_sin, rope_inv_freq
from .configuration_llama import LlamaConfig


class LlamaMLP(Module):
    """Gated SwiGLU MLP (reference modeling_llama.py:163)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        bias = getattr(config, "mlp_bias", False)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.gate_proj = Linear(config.hidden_size, config.intermediate_size, bias, **kw)
        self.up_proj = Linear(config.hidden_size, config.intermediate_size, bias, **kw)
        self.down_proj = Linear(config.intermediate_size, config.hidden_size, bias, **kw)
        self.act_fn = get_activation(
            getattr(config, "hidden_activation", None) or config.hidden_act
        )

    def __call__(self, params, x):
        return self.down_proj(
            params["down_proj"],
            self.act_fn(self.gate_proj(params["gate_proj"], x)) * self.up_proj(params["up_proj"], x),
        )


class LlamaAttention(Module):
    """GQA attention with registry dispatch (reference modeling_llama.py:217-283).

    Config-driven knobs subclasses rely on:
    - ``attention_qkv_bias`` / ``attention_o_bias`` (fall back to
      ``attention_bias``): Qwen2-style asymmetric biases.
    - per-layer sliding window via ``layer_sliding_window`` (layer_types /
      sliding_window / use_sliding_window / max_window_layers).
    - ``attn_logit_softcapping``: Gemma2 tanh capping.
    - ``query_pre_attn_scalar``: Gemma2 scale override.
    - ``self.q_norm``/``self.k_norm`` hooks (Qwen3/Gemma3 per-head RMSNorm).
    """

    # Rope application style: subclasses swap in the interleaved variant
    # (Cohere/GPT-J family) via this hook.
    rope_fn = staticmethod(apply_rotary_pos_emb)

    def __init__(self, config, layer_idx: int, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = getattr(config, "num_key_value_heads", None) or config.num_attention_heads
        self.head_dim = getattr(config, "head_dim", None) or config.hidden_size // config.num_attention_heads
        scalar = getattr(config, "query_pre_attn_scalar", None)
        self.scale = (scalar**-0.5) if scalar else self.head_dim**-0.5
        self.sliding_window = layer_sliding_window(config, layer_idx)
        self.logit_cap = getattr(config, "attn_logit_softcapping", None)
        bias = getattr(config, "attention_bias", False)
        qkv_bias = getattr(config, "attention_qkv_bias", None)
        o_bias = getattr(config, "attention_o_bias", None)
        qkv_bias = bias if qkv_bias is None else qkv_bias
        o_bias = bias if o_bias is None else o_bias
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.build_projections(config, qkv_bias, o_bias, kw)
        self.q_norm: Optional[Module] = None
        self.k_norm: Optional[Module] = None

    def build_projections(self, config, qkv_bias, o_bias, kw):
        """Separate q/k/v/o projections; fused-checkpoint families override."""
        self.q_proj = Linear(config.hidden_size, self.num_heads * self.head_dim, qkv_bias, **kw)
        self.k_proj = Linear(config.hidden_size, self.num_kv_heads * self.head_dim, qkv_bias, **kw)
        self.v_proj = Linear(config.hidden_size, self.num_kv_heads * self.head_dim, qkv_bias, **kw)
        self.o_proj = Linear(self.num_heads * self.head_dim, config.hidden_size, o_bias, **kw)

    def project_qkv(self, params, hidden):
        """Split projections; subclasses with fused checkpoints override."""
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_kv_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_kv_heads, self.head_dim)
        return q, k, v

    def project_out(self, params, out):
        return self.o_proj(params["o_proj"], out)

    def extra_attn_kwargs(self, params):
        """Extra kwargs for the attention kernel derived from this module's
        params (e.g. GPT-OSS learned sink logits)."""
        return {}

    def post_rope_qk(self, params, q, k):
        """Hook applied to q/k AFTER rope (HunYuan post-rope head norms)."""
        return q, k

    def _maybe_fused_decode(self, params, q, k, v, cos, sin, kwargs, cache,
                            cache_position):
        """Route the single-token decode step through the fused Pallas kernel
        when the family uses plain rotate-half rope and a bhsd cache. Returns
        (out, new_cache) or None to take the unfused path."""
        import jax

        from ...cache_utils import StaticKVCache
        from ...ops.pallas.fused_decode import (fused_decode_attention,
                                                fused_decode_supported)

        import os

        cls = type(self)
        # Batch-size crossover (measured 2026-08-20, Llama-3-8B on v5e, TPOT
        # two-point differencing): at B=8 the XLA decode path wins (0.951 vs
        # 0.940 of the bf16 HBM roofline — the kernel's per-layer launch +
        # DMA-wait overhead exceeds its fusion benefit at a small slab),
        # while at B=16 the fused kernel wins decisively (int8 leg 0.973 vs
        # 0.882 of its roofline). Route small batches to XLA; override with
        # config.fused_decode_min_batch or TTPU_FORCE_FUSED_DECODE.
        min_batch = getattr(self.config, "fused_decode_min_batch", 16)
        if os.environ.get("TTPU_FORCE_FUSED_DECODE"):
            min_batch = 0
        if (os.environ.get("TTPU_NO_FUSED_DECODE")
                or q.shape[0] < min_batch
                or cache is None
                or not isinstance(cache, StaticKVCache)
                or getattr(cache, "layout", "bshd") != "bhsd"
                or q.shape[1] != 1
                or cos is None
                or not getattr(self, "apply_rope", True)
                or cls.rope_fn is not LlamaAttention.rope_fn
                or cls.post_rope_qk is not LlamaAttention.post_rope_qk
                or cos.shape[-1] != self.head_dim
                or kwargs.get("logit_cap") is not None
                or kwargs.get("sinks") is not None
                or kwargs.get("probs_sink") is not None
                or kwargs.get("chunk_size") is not None
                or kwargs.get("q_block_ids") is not None
                or not kwargs.get("is_causal", True)):
            return None
        k_cache, v_cache = cache.layer(self.layer_idx)
        if k_cache.dtype != self.dtype or not fused_decode_supported(q, k_cache, self.head_dim):
            return None
        kv_valid = kwargs.get("kv_valid")
        if kv_valid is None:
            return None
        import jax.numpy as jnp

        pos = jnp.asarray(cache_position, jnp.int32).reshape(())
        first_valid = jnp.argmax(kv_valid, axis=-1).astype(jnp.int32)
        if self.sliding_window is not None:
            first_valid = jnp.maximum(first_valid, pos + 1 - self.sliding_window)
        out, new_k, new_v = fused_decode_attention(
            q, k, v, cos[:, :1, :], sin[:, :1, :], k_cache, v_cache, pos,
            first_valid, kv_valid, scale=float(self.scale))
        from dataclasses import replace

        keys = cache.keys[: self.layer_idx] + (new_k,) + cache.keys[self.layer_idx + 1:]
        values = cache.values[: self.layer_idx] + (new_v,) + cache.values[self.layer_idx + 1:]
        return out, replace(cache, keys=keys, values=values)

    def __call__(
        self,
        params,
        hidden: jnp.ndarray,  # [B, S, E]
        cos: jnp.ndarray,
        sin: jnp.ndarray,
        attn_args: dict[str, Any],
        cache: Optional[StaticKVCache],
        cache_position,
    ) -> tuple[jnp.ndarray, Optional[StaticKVCache]]:
        b, s, _ = hidden.shape
        q, k, v = self.project_qkv(params, hidden)
        if self.q_norm is not None:
            q = self.q_norm(params["q_norm"], q)
        if self.k_norm is not None:
            k = self.k_norm(params["k_norm"], k)

        kwargs = dict(attn_args)
        kwargs["sliding_window"] = self.sliding_window
        kwargs["logit_cap"] = self.logit_cap
        kwargs.update(self.extra_attn_kwargs(params))

        # Fused decode step (rope + cache write + attention in one Pallas
        # kernel, ops/pallas/fused_decode.py) — the single-token hot path.
        fused = self._maybe_fused_decode(params, q, k, v, cos, sin, kwargs,
                                         cache, cache_position)
        if fused is not None:
            out, cache = fused
            out = out.reshape(b, s, self.num_heads * self.head_dim)
            return self.project_out(params, out), cache

        if cos is not None and getattr(self, "apply_rope", True):
            q, k = self.rope_fn(q, k, cos, sin)
        q, k = self.post_rope_qk(params, q, k)

        # Static prefill (cache_position is the Python int 0, s covers the
        # whole prompt): attend over the just-computed LOCAL k/v — the cache
        # holds nothing else yet, and the local slice is both smaller than
        # the full buffer and already in the flash kernel's bshd layout.
        is_static_prefill = (
            cache is not None and s > 1
            and isinstance(cache_position, int) and cache_position == 0
        )
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)

        if cache is None or is_static_prefill:
            if is_static_prefill and kwargs.get("kv_valid") is not None:
                kwargs["kv_valid"] = kwargs["kv_valid"][:, :s]
            if is_static_prefill and kwargs.get("kv_block_ids") is not None:
                kwargs["kv_block_ids"] = kwargs["kv_block_ids"][:, :s]
            attn_fn = get_attention_fn(self.config.attn_implementation)
            out = attn_fn(q, k, v, scale=self.scale, **kwargs)
        elif (getattr(cache, "layout", "bshd") == "paged" and s == 1
              and self.head_dim % 128 == 0
              and not os.environ.get("TTPU_NO_PAGED_KERNEL")
              and kwargs.get("logit_cap") is None and kwargs.get("sinks") is None
              and kwargs.get("probs_sink") is None):
            # continuous-batching decode: block-table kernel, no gather
            # (reference flash_attn_with_kvcache, integrations/flash_paged.py:50).
            # head_dim % 128 gate: Mosaic DMA lane alignment
            # (ops/pallas/paged_attention.paged_decode_supported) — odd head
            # dims take the gather fallback below.
            from ...ops.pallas.paged_attention import paged_decode_attention

            k_pool, v_pool, block_tables, ctx_lens = cache.paged_layer(self.layer_idx)
            out = paged_decode_attention(
                q, k_pool.astype(self.dtype), v_pool.astype(self.dtype),
                block_tables, ctx_lens, scale=self.scale,
                sliding_window=self.sliding_window)
        elif getattr(cache, "layout", "bshd") == "bhsd":
            from ...ops.attention import cached_attention_bhsd

            k_full, v_full = cache.layer(self.layer_idx)
            out = cached_attention_bhsd(
                q, k_full.astype(self.dtype), v_full.astype(self.dtype),
                scale=self.scale, **kwargs)
        else:
            k_full, v_full = cache.layer(self.layer_idx)
            attn_fn = get_attention_fn(self.config.attn_implementation)
            out = attn_fn(q, k_full.astype(self.dtype), v_full.astype(self.dtype),
                          scale=self.scale, **kwargs)
        out = out.reshape(b, s, self.num_heads * self.head_dim)
        return self.project_out(params, out), cache


class LlamaDecoderLayer(Module):
    """Pre-norm residual block (reference modeling_llama.py:284)."""

    attention_cls = LlamaAttention
    mlp_cls = LlamaMLP

    def __init__(self, config, layer_idx: int, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.input_layernorm = self.make_norm(config, **kw)
        self.self_attn = self.attention_cls(config, layer_idx, **kw)
        self.post_attention_layernorm = self.make_norm(config, **kw)
        self.mlp = self.mlp_cls(config, **kw)

    @staticmethod
    def make_norm(config, **kw):
        return RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args, cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        hidden = residual + h
        return hidden, cache


class LlamaModel(Module):
    """Bare transformer (reference modeling_llama.py:347)."""

    decoder_layer_cls = LlamaDecoderLayer
    # scale inputs_embeds by sqrt(hidden) (Gemma family)
    scale_embeddings: bool = False
    # checkpoint name of the final norm ("final_layernorm" for Phi)
    norm_name: str = "norm"
    # PaliGemma-style prefix-LM inference: queries attend to every valid kv
    # slot (set False on the instance by composing models)
    causal_attention: bool = True

    def __init__(self, config: LlamaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size, dtype=dtype, param_dtype=param_dtype,
                                      embedding_init=normal_init(config.initializer_range))
        self.layers = [
            self.decoder_layer_cls(config, i, dtype=dtype, param_dtype=param_dtype)
            for i in range(config.num_hidden_layers)
        ]
        setattr(self, self.norm_name,
                self.decoder_layer_cls.make_norm(config, dtype=dtype, param_dtype=param_dtype))
        self.inv_freq, self.attention_scaling = rope_inv_freq(config)

    def compute_rope(self, position_ids):
        """(cos, sin) tables for every layer; Gemma3 overrides with a
        (global, local) pair selected per layer type."""
        return compute_cos_sin(position_ids, self.inv_freq, self.attention_scaling, dtype=self.dtype)

    def rope_for_layer(self, rope, layer_idx):
        return rope

    def embed_scale(self):
        # Gemma multiplies embeddings by sqrt(hidden) *rounded to the compute
        # dtype* (reference models/gemma/modeling_gemma.py normalizer).
        return jnp.asarray(self.config.hidden_size**0.5, self.dtype)

    def embed(self, params, input_ids):
        """Token embedding hook; families with extra embedding-stage work
        (ModernBertDecoder's post-embedding LayerNorm) override this."""
        inputs_embeds = self.embed_tokens(params["embed_tokens"], input_ids)
        if self.scale_embeddings:
            inputs_embeds = inputs_embeds * self.embed_scale()
        return inputs_embeds

    def __call__(
        self,
        params,
        input_ids: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        past_key_values: Optional[StaticKVCache] = None,
        cache_position=0,
        inputs_embeds: Optional[jnp.ndarray] = None,
        output_hidden_states: bool = False,
        output_attentions: bool = False,
        token_type_ids: Optional[jnp.ndarray] = None,
    ) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.embed(params, input_ids)
        hidden = inputs_embeds
        b, s, _ = hidden.shape

        explicit_positions = position_ids is not None
        if position_ids is None:
            # Reference default: positions from cache_position (arange), NOT
            # mask-derived — callers with padded batches pass explicit
            # position_ids, exactly as the reference's generate() does.
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :] + jnp.asarray(cache_position, jnp.int32)
            position_ids = jnp.broadcast_to(position_ids, (b, s))
        rope = self.compute_rope(position_ids)

        kv_len = past_key_values.max_len if past_key_values is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid,
                     "is_causal": self.causal_attention, "sliding_window": None}
        if (past_key_values is None and explicit_positions
                and self.causal_attention and position_ids.ndim == 2):
            # (3D [t,h,w] M-RoPE position ids are not packed-sequence markers)
            # Packed-sequence rows: explicit position_ids with resets mark
            # sequence boundaries (reference masking_utils.py:159); a plain
            # arange collapses to one segment, so this is behavior-preserving
            # for ordinary padded batches.
            from ...ops.masks import segment_ids_from_position_ids

            seg = segment_ids_from_position_ids(position_ids)
            attn_args["q_segment_ids"] = seg
            attn_args["kv_segment_ids"] = seg
        if token_type_ids is not None:
            # Multimodal blockwise overlay: consecutive runs of image tokens
            # (token_type_ids == 1) form blocks that attend bidirectionally
            # (reference models/gemma3/modeling_gemma3.py:698
            # ``get_block_sequence_ids_for_mask``). Decode steps pass no
            # token_type_ids, so this only shapes prefill.
            is_image = token_type_ids.astype(jnp.int32) == 1
            prev = jnp.concatenate(
                [jnp.zeros_like(is_image[:, :1]), is_image[:, :-1]], axis=-1)
            group = jnp.cumsum((is_image & ~prev).astype(jnp.int32), axis=-1) - 1
            block = jnp.where(is_image, group, -1)
            attn_args["q_block_ids"] = block
            attn_args["kv_block_ids"] = (
                block if kv_len == s
                else jnp.pad(block, ((0, 0), (0, kv_len - s)), constant_values=-1))
        # output_attentions channel: attention impls append [B, H, Q, KV]
        # probs here (forces the eager path — see ops/attention.py).
        probs_sink = [] if output_attentions else None
        if output_attentions:
            attn_args["probs_sink"] = probs_sink

        all_hidden = [] if output_hidden_states else None
        cache = past_key_values
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            cos, sin = self.rope_for_layer(rope, i)
            hidden, cache = layer(params["layers"][str(i)], hidden, cos, sin, attn_args, cache, cache_position)
        hidden = getattr(self, self.norm_name)(params[self.norm_name], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden,
            past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
            attentions=tuple(probs_sink) if probs_sink is not None else None,
        )


class LlamaPreTrainedModel(PreTrainedModel):
    config_class = LlamaConfig
    base_model_prefix = "model"


# Default decoder tp plan (reference modeling_llama.py:424-426); shared by
# every Llama-skeleton family.
DECODER_TP_PLAN = {
    r"model\.embed_tokens\.weight": "embed",
    r".*\.self_attn\.(q|k|v)_proj\.(weight|bias)": "colwise",
    r".*\.self_attn\.qkv_proj\.(weight|bias)": "colwise",
    r".*\.self_attn\.o_proj\.weight": "rowwise",
    r".*\.mlp\.(gate|up)_proj\.weight": "colwise",
    r".*\.mlp\.gate_up_proj\.weight": "colwise",
    r".*\.mlp\.down_proj\.weight": "rowwise",
    r"lm_head\.weight": "colwise",
}


class LlamaForCausalLM(LlamaPreTrainedModel, GenerationMixin):
    """Reference modeling_llama.py:421. ``_tp_plan`` mirrors :424-426."""

    model_cls = LlamaModel
    _tp_plan = DECODER_TP_PLAN

    def __init__(self, config: LlamaConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = self.model_cls(config, dtype=self.dtype, param_dtype=self.param_dtype)
        # When word embeddings are tied, logits come from embed_tokens.attend —
        # no lm_head param exists at all (zero extra HBM vs. the reference's
        # pointer-tied tensors, modeling_utils.py:2607).
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.hidden_size, config.vocab_size, False, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  kernel_init=normal_init(config.initializer_range))

    def get_input_embedding_path(self):
        return "model.embed_tokens.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def compute_logits(self, params, hidden):
        if self.config.tie_word_embeddings:
            logits = self.model.embed_tokens.attend(params["model"]["embed_tokens"], hidden)
        else:
            logits = self.lm_head(params["lm_head"], hidden)
        cap = getattr(self.config, "final_logit_softcapping", None)
        if cap:
            logits = jnp.tanh(logits / cap) * cap
        return logits

    def __call__(
        self,
        params,
        input_ids: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        past_key_values: Optional[StaticKVCache] = None,
        cache_position=0,
        inputs_embeds: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        logits_to_keep: int = 0,
        output_hidden_states: bool = False,
        output_attentions: bool = False,
        *,
        shift_labels: Optional[jnp.ndarray] = None,
    ) -> CausalLMOutputWithPast:
        outputs = self.model(
            params["model"], input_ids, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states,
            output_attentions,
        )
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None or shift_labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size,
                                      shift_labels=shift_labels)
        return CausalLMOutputWithPast(
            loss=loss,
            logits=logits,
            past_key_values=outputs.past_key_values,
            hidden_states=outputs.hidden_states,
            attentions=outputs.attentions,
        )

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        # bhsd: decode-optimal layout (contiguous per-head KV slabs); see
        # cache_utils.StaticKVCache and ops/attention.cached_attention_bhsd.
        return cache_from_config(self.config, batch_size, max_len, dtype or self.dtype,
                                 implementation=implementation, layout="bhsd")


class LlamaModelStandalone(LlamaPreTrainedModel):
    """Bare LlamaModel exposed as a loadable checkpoint target (AutoModel)."""

    model_cls = LlamaModel

    def __init__(self, config: LlamaConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = self.model_cls(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.model(params["model"], *args, **kwargs)


# ---------------------------------------------------------------------------
# Task heads (reference modeling_llama.py LlamaForSequenceClassification /
# LlamaForTokenClassification / LlamaForQuestionAnswering via the generic
# heads, modeling_layers.py:118-254)
# ---------------------------------------------------------------------------
from ...modeling_layers import (  # noqa: E402
    GenericForQuestionAnswering,
    GenericForSequenceClassification,
    GenericForTokenClassification,
)


class LlamaForSequenceClassification(GenericForSequenceClassification):
    config_class = LlamaConfig
    model_cls = LlamaModel


class LlamaForTokenClassification(GenericForTokenClassification):
    config_class = LlamaConfig
    model_cls = LlamaModel


class LlamaForQuestionAnswering(GenericForQuestionAnswering):
    config_class = LlamaConfig
    model_cls = LlamaModel
