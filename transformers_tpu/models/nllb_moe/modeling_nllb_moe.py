"""NLLB-MoE — fairseq top-2 expert-choice translation model, TPU-native
(reference src/transformers/models/nllb_moe/modeling_nllb_moe.py).

M2M100's pre-LN seq2seq stack with every ``sparse_step``-th FFN replaced by a
top-2 capacity-routed mixture (NllbMoeTop2Router :165, NllbMoeSparseMLP :367).
Routing is the exact fairseq algorithm — f32 softmax, top-1 then masked top-2,
cumsum capacity drop (optionally batch-prioritized), post-drop prob
normalization, and the eval-time ``1 - moe_token_dropout`` output scale.
Expert execution is a dense weighted mixture over the stacked experts: every
selected token's combine weight is already zero for unrouted experts, so the
combine einsum on the MXU replaces torch's index_add_ scatter loop."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...core.module import LayerNorm, Linear, Module
from ..bart.modeling_bart import (
    BartAttention,
    BartForConditionalGeneration,
    BartModel,
    BartPreTrainedModel,
    get_activation,
)
from ..m2m_100.modeling_m2m_100 import M2M100Decoder, M2M100Encoder
from .configuration_nllb_moe import NllbMoeConfig


class NllbMoeDenseActDense(Module):
    """reference :318."""

    def __init__(self, config, ffn_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.fc1 = Linear(config.d_model, ffn_dim, **kw)
        self.fc2 = Linear(ffn_dim, config.d_model, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class NllbMoeTop2Router(Module):
    """Fairseq tokens-choose-top-2 router with expert capacity (reference :165)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.classifier = Linear(config.d_model, config.num_experts,
                                 use_bias=config.router_bias,
                                 dtype=dtype, param_dtype=param_dtype)
        if config.second_expert_policy != "all":
            raise NotImplementedError(
                "second_expert_policy 'sampling'/'random' are stochastic training "
                "policies; hub NLLB-MoE checkpoints use 'all'")

    def __call__(self, params, hidden_flat, padding_valid=None):
        """[T, D] (+ optional [T] validity) -> combine probs [T, E]."""
        cfg = self.config
        nb_tokens, num_experts = hidden_flat.shape[0], cfg.num_experts
        logits = self.classifier(params["classifier"],
                                 hidden_flat.astype(jnp.float32))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        top_1_idx = jnp.argmax(probs, axis=-1)
        top_1_mask = jax.nn.one_hot(top_1_idx, num_experts, dtype=jnp.float32)
        masked = jnp.where(top_1_mask.astype(bool), -jnp.inf, logits)
        top_2_idx = jnp.argmax(masked, axis=-1)
        top_2_mask = jax.nn.one_hot(top_2_idx, num_experts, dtype=jnp.float32)

        def normalize(p, m1, m2):
            p1 = jnp.sum(p * m1, axis=1)
            p2 = jnp.sum(p * m2, axis=1)
            denom = jnp.maximum(p1 + p2, jnp.finfo(jnp.float32).eps)
            return p1 / denom, p2 / denom

        if cfg.normalize_router_prob_before_dropping:
            top_1_max, top_2_max = normalize(probs, top_1_mask, top_2_mask)

        if padding_valid is not None and not cfg.router_ignore_padding_tokens:
            keep = padding_valid.astype(jnp.float32)[:, None]
            top_1_mask = top_1_mask * keep
            top_2_mask = top_2_mask * keep

        if cfg.batch_prioritized_routing:
            # route important tokens first (reference :255)
            order = jnp.argsort(-jnp.max(probs, axis=1), axis=0)
            inv = jnp.argsort(order, axis=0)
            loc1 = ((jnp.cumsum(top_1_mask[order], axis=0) - 1) * top_1_mask[order])[inv]
            loc2 = ((jnp.cumsum(top_2_mask[order], axis=0) - 1) * top_2_mask[order])[inv]
        else:
            loc1 = jnp.cumsum(top_1_mask, axis=0) - 1
            loc2 = jnp.cumsum(top_2_mask, axis=0) - 1
        loc2 = loc2 + jnp.sum(top_1_mask, axis=0, keepdims=True)

        # inference capacity (reference :272): fraction of the token count
        if cfg.moe_eval_capacity_token_fraction > 0:
            capacity = math.ceil(cfg.moe_eval_capacity_token_fraction * nb_tokens)
        else:
            capacity = cfg.expert_capacity if cfg.expert_capacity is not None \
                else 2 * math.ceil(nb_tokens / num_experts)
        top_1_mask = top_1_mask * (loc1 < capacity)
        top_2_mask = top_2_mask * (loc2 < capacity)

        if not cfg.normalize_router_prob_before_dropping:
            top_1_max, top_2_max = normalize(probs, top_1_mask, top_2_mask)

        combine = top_1_max[:, None] * top_1_mask + top_2_max[:, None] * top_2_mask
        return combine


class NllbMoeExperts(Module):
    """Named expert bank expert_0..expert_{E-1} (reference :340)."""

    def __init__(self, config, ffn_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_experts = config.num_experts
        for i in range(config.num_experts):
            setattr(self, f"expert_{i}",
                    NllbMoeDenseActDense(config, ffn_dim, dtype=dtype,
                                         param_dtype=param_dtype))

    def __call__(self, params, flat, combine, scale):
        out = jnp.zeros_like(flat, dtype=jnp.float32)
        for i in range(self.num_experts):
            expert = getattr(self, f"expert_{i}")
            y = expert(params[f"expert_{i}"], flat).astype(jnp.float32)
            out = out + combine[:, i : i + 1] * y * scale
        return out


class NllbMoeSparseMLP(Module):
    """Router + per-expert FFNs, combined as a dense mixture (reference :367)."""

    def __init__(self, config, ffn_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.router = NllbMoeTop2Router(config, **kw)
        self.experts = NllbMoeExperts(config, ffn_dim, **kw)

    def __call__(self, params, hidden, padding_valid=None):
        b, s, d = hidden.shape
        flat = hidden.reshape(-1, d)
        if padding_valid is not None:
            padding_valid = padding_valid.reshape(-1)
        combine = self.router(params["router"], flat, padding_valid)  # [T, E]
        scale = 1.0 - self.config.moe_token_dropout  # eval-time scaling (:360)
        out = self.experts(params["experts"], flat, combine, scale)
        return out.astype(hidden.dtype).reshape(b, s, d)


class NllbMoeEncoderLayer(Module):
    """Pre-LN encoder layer; key names ffn/ff_layer_norm (reference :513)."""

    is_sparse = False

    def __init__(self, config, is_sparse=False, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.is_sparse = is_sparse
        self.self_attn = BartAttention(d, config.encoder_attention_heads, config, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        if is_sparse:
            self.ffn = NllbMoeSparseMLP(config, config.encoder_ffn_dim, **kw)
        else:
            self.ffn = NllbMoeDenseActDense(config, config.encoder_ffn_dim, **kw)
        self.ff_layer_norm = LayerNorm(d, 1e-5, **kw)

    def __call__(self, params, hidden, attn_args):
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        h, _ = self.self_attn(params["self_attn"], h, attn_args)
        hidden = hidden + h
        h = self.ff_layer_norm(params["ff_layer_norm"], hidden)
        if self.is_sparse:
            h = self.ffn(params["ffn"], h, attn_args.get("kv_valid"))
        else:
            h = self.ffn(params["ffn"], h)
        return hidden + h


class NllbMoeDecoderLayer(Module):
    """Pre-LN decoder layer; cross_attention naming (reference :557)."""

    def __init__(self, config, is_sparse=False, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.is_sparse = is_sparse
        self.self_attn = BartAttention(d, config.decoder_attention_heads, config, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.cross_attention = BartAttention(d, config.decoder_attention_heads, config, **kw)
        self.cross_attention_layer_norm = LayerNorm(d, 1e-5, **kw)
        if is_sparse:
            self.ffn = NllbMoeSparseMLP(config, config.decoder_ffn_dim, **kw)
        else:
            self.ffn = NllbMoeDenseActDense(config, config.decoder_ffn_dim, **kw)
        self.ff_layer_norm = LayerNorm(d, 1e-5, **kw)

    def __call__(self, params, hidden, attn_args, cross_args, cross_kv, cache,
                 layer_idx, cache_position):
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, attn_args, cache=cache,
                                  layer_idx=layer_idx, cache_position=cache_position)
        hidden = hidden + h
        h = self.cross_attention_layer_norm(params["cross_attention_layer_norm"], hidden)
        h, _ = self.cross_attention(params["cross_attention"], h, cross_args,
                                    kv_precomputed=cross_kv)
        hidden = hidden + h
        h = self.ff_layer_norm(params["ff_layer_norm"], hidden)
        if self.is_sparse:
            # current-token validity: full forward has kv_valid == [B, s];
            # incremental decode steps are always live tokens
            valid = attn_args.get("kv_valid")
            if valid is not None and valid.shape[1] != h.shape[1]:
                valid = None
            h = self.ffn(params["ffn"], h, valid)
        else:
            h = self.ffn(params["ffn"], h)
        return hidden + h, cache


def _sparse_flags(n_layers, sparse_step):
    return [(i + 1) % sparse_step == 0 if sparse_step > 0 else False
            for i in range(n_layers)]


class NllbMoeEncoder(M2M100Encoder):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layers = [NllbMoeEncoderLayer(config, sp, **kw)
                       for sp in _sparse_flags(config.encoder_layers,
                                               config.encoder_sparse_step)]


class NllbMoeDecoder(M2M100Decoder):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layers = [NllbMoeDecoderLayer(config, sp, **kw)
                       for sp in _sparse_flags(config.decoder_layers,
                                               config.decoder_sparse_step)]


class NllbMoeModel(BartModel):
    encoder_cls = NllbMoeEncoder
    decoder_cls = NllbMoeDecoder


class NllbMoePreTrainedModel(BartPreTrainedModel):
    config_class = NllbMoeConfig


class NllbMoeForConditionalGeneration(BartForConditionalGeneration):
    config_class = NllbMoeConfig
    model_cls = NllbMoeModel
    use_final_logits_bias = False

    def precompute_cross_kv(self, params, encoder_hidden):
        out = []
        for i, layer in enumerate(self.model.decoder.layers):
            out.append(layer.cross_attention.kv(
                params["model"]["decoder"]["layers"][str(i)]["cross_attention"],
                encoder_hidden))
        return tuple(out)
