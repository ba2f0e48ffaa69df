"""LongT5, TPU-native (reference src/transformers/models/longt5/modeling_longt5.py).

T5 encoder-decoder whose *encoder* self-attention is block-local ("local",
ETC-style sliding blocks) or block-local plus summed block summaries
("transient-global", TGlobal).  The blocked formulation is already the right
TPU shape: static reshapes into [num_blocks, block_len], a 3-block gather for
keys/values, and batched einsums that land on the MXU — no dynamic shapes.
The decoder is a standard T5 stack (bucketed relative bias, causal cache),
reused directly from our T5 implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...modeling_outputs import BaseModelOutput
from ..t5.modeling_t5 import (T5ForConditionalGeneration, T5LayerFF,
                              T5PreTrainedModel, T5Stack,
                              relative_position_bucket)
from .configuration_longt5 import LongT5Config


# ---------------------------------------------------------------- block utils
def _split_into_blocks(x, block_len: int, axis: int):
    """Pad `axis` up to a multiple of block_len, then reshape into
    [..., num_blocks, block_len, ...] (reference _split_into_blocks)."""
    pad_len = -x.shape[axis] % block_len
    if pad_len:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, pad_len)
        x = jnp.pad(x, pad)
    num_blocks = x.shape[axis] // block_len
    return x.reshape(x.shape[:axis] + (num_blocks, block_len) + x.shape[axis + 1:])


def _concatenate_3_blocks(x, block_axis: int, seq_axis: int):
    """For each block, concat [prev | self | next] along seq_axis
    (reference _concatenate_3_blocks)."""
    num_blocks = x.shape[block_axis]
    pad = [(0, 0)] * x.ndim
    pad[block_axis] = (1, 1)
    x = jnp.pad(x, pad)
    slices = []
    for i in range(3):
        idx = [slice(None)] * x.ndim
        idx[block_axis] = slice(i, i + num_blocks)
        slices.append(x[tuple(idx)])
    return jnp.concatenate(slices, axis=seq_axis)


def _local_rel_position_ids(block_len: int):
    """[block_len, 3*block_len] relative ids of 3-block keys vs center queries."""
    positions = jnp.arange(3 * block_len, dtype=jnp.int32)
    center = positions[block_len:-block_len]
    return positions[None, :] - center[:, None]


def _local_mask_bias(mask_2d, block_len: int):
    """[b, num_blocks, 1, block_len, 3*block_len] additive 0/-1e10 mask
    (reference _get_local_attention_mask): valid query x valid key within
    the same/adjacent block, clipped to |rel| < block_len."""
    blocked = _split_into_blocks(mask_2d.astype(bool), block_len, 1)
    three = _concatenate_3_blocks(blocked, 1, 2)
    locality = jnp.abs(_local_rel_position_ids(block_len)) < block_len
    ok = blocked[..., :, None] & three[..., None, :] & locality[None, None]
    return jnp.where(ok, 0.0, -1e10)[:, :, None]


def _make_global_fixed_block_ids(mask_2d, global_block_size: int):
    """(reference _make_global_fixed_block_ids): per-token global block id
    (-1 for padding; orphan tokens folded into the last full block) and the
    [b, seq_len // gbs] segment validity ids."""
    b, s = mask_2d.shape
    mask_f = mask_2d.astype(jnp.float32)
    fixed = jnp.full((b, s), 1.0 / global_block_size)
    fixed = jnp.cumsum(fixed, axis=1) - fixed
    markers = jnp.where(mask_f != 0.0, 1.0, -1000.0)
    block_ids = jnp.floor(markers + fixed - 1.0)
    block_ids = jnp.maximum(block_ids, -1.0)
    block_ids = block_ids * mask_f + (mask_f - 1.0)
    block_ends = (jnp.arange(s) % global_block_size) == global_block_size - 1
    true_ends = block_ends[None, :] & (block_ids >= 0)
    full_blocks = true_ends.sum(-1, keepdims=True).astype(block_ids.dtype) - 1.0
    block_ids = jnp.minimum(block_ids, full_blocks)
    num_globals = s // global_block_size
    seq_max = block_ids.max(axis=-1, keepdims=True)
    segment = jnp.cumsum(jnp.ones((b, num_globals)), axis=-1) - 1
    segment_ids = (segment <= seq_max).astype(jnp.int32)
    return block_ids.astype(jnp.int32), segment_ids


def _create_global_aggregates(hidden, block_ids, global_seq_len: int):
    """Sum token states into their global block (reference
    _create_global_aggregates) — a one-hot einsum, MXU-friendly."""
    safe = jnp.where(block_ids >= 0, block_ids, global_seq_len)
    one_hot = jax.nn.one_hot(safe, global_seq_len + 1,
                             dtype=hidden.dtype)[:, :, :-1]
    return jnp.einsum("bnd,bng->bgd", hidden, one_hot)


# ----------------------------------------------------------------- attention
class LongT5LocalAttention(Module):
    """Block-local encoder attention (reference LongT5LocalAttention)."""

    def __init__(self, config: LongT5Config, has_bias, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_heads
        self.d_kv = config.d_kv
        self.block_len = config.local_radius + 1
        inner = config.num_heads * config.d_kv
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.05))
        self.q = Linear(config.d_model, inner, False, **kw)
        self.k = Linear(config.d_model, inner, False, **kw)
        self.v = Linear(config.d_model, inner, False, **kw)
        self.o = Linear(inner, config.d_model, False, **kw)
        self.has_relative_attention_bias = has_bias
        if has_bias:
            self.relative_attention_bias = Embedding(
                config.relative_attention_num_buckets, config.num_heads,
                dtype=dtype, param_dtype=param_dtype,
                embedding_init=normal_init(0.05))

    def compute_bias(self, params):
        """[1, 1, H, block_len, 3*block_len] fp32 local relative bias."""
        rel = _local_rel_position_ids(self.block_len)
        bucket = relative_position_bucket(
            rel, bidirectional=True,
            num_buckets=self.config.relative_attention_num_buckets,
            max_distance=self.config.relative_attention_max_distance)
        table = params["relative_attention_bias"]["weight"].astype(jnp.float32)
        bias = jnp.take(table, bucket, axis=0)       # [L, 3L, H]
        return bias.transpose(2, 0, 1)[None, None]   # [1, 1, H, L, 3L]

    def _shape(self, x, b):
        return x.reshape(b, -1, self.num_heads, self.d_kv)

    def _blocked_qkv(self, params, hidden):
        b, s, _ = hidden.shape
        q = _split_into_blocks(self._shape(self.q(params["q"], hidden), b), self.block_len, 1)
        k = _split_into_blocks(self._shape(self.k(params["k"], hidden), b), self.block_len, 1)
        v = _split_into_blocks(self._shape(self.v(params["v"], hidden), b), self.block_len, 1)
        k = _concatenate_3_blocks(k, 1, 2)
        v = _concatenate_3_blocks(v, 1, 2)
        return q, k, v

    def _finish(self, params, scores, pos_bias, v, b, s):
        scores = scores + pos_bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bnhqk,bnkhd->bnqhd", probs, v)
        out = out.reshape(b, -1, self.num_heads * self.d_kv)[:, :s]
        return self.o(params["o"], out)

    def __call__(self, params, hidden, pos_bias):
        b, s, _ = hidden.shape
        q, k, v = self._blocked_qkv(params, hidden)
        scores = jnp.einsum("bnqhd,bnkhd->bnhqk", q, k).astype(jnp.float32)
        return self._finish(params, scores, pos_bias, v, b, s)


class LongT5TransientGlobalAttention(LongT5LocalAttention):
    """Local attention + attention to summed global block summaries
    (reference LongT5TransientGlobalAttention)."""

    def __init__(self, config, has_bias, *, dtype, param_dtype):
        super().__init__(config, has_bias, dtype=dtype, param_dtype=param_dtype)
        if has_bias:
            self.global_relative_attention_bias = Embedding(
                config.relative_attention_num_buckets, config.num_heads,
                dtype=dtype, param_dtype=param_dtype,
                embedding_init=normal_init(0.05))
        self.global_input_layer_norm = RMSNorm(
            config.d_model, config.layer_norm_epsilon, dtype=dtype,
            param_dtype=param_dtype)

    def compute_side_bias(self, params, mask_2d, segment_ids):
        """[b, H, seq, global_seq] fp32 side bias: segment-match mask plus
        bucketed global relative bias (reference compute_side_bias)."""
        side_ok = mask_2d[:, :, None] == segment_ids[:, None, :]
        side_mask = jnp.where(side_ok, 0.0, -1e10)[:, None]   # [b,1,s,g]
        block_ids, _ = _make_global_fixed_block_ids(mask_2d, self.config.global_block_size)
        global_positions = jnp.arange(segment_ids.shape[-1], dtype=jnp.int32)
        side_rel = global_positions[None, None, :] - block_ids[..., None]
        bucket = relative_position_bucket(
            side_rel, bidirectional=True,
            num_buckets=self.config.relative_attention_num_buckets,
            max_distance=self.config.relative_attention_max_distance)
        table = params["global_relative_attention_bias"]["weight"].astype(jnp.float32)
        side_bias = jnp.take(table, bucket, axis=0)          # [b,s,g,H]
        return side_mask + side_bias.transpose(0, 3, 1, 2)

    def __call__(self, params, hidden, pos_bias, block_ids, global_seq_len):
        b, s, _ = hidden.shape
        global_inputs = _create_global_aggregates(hidden, block_ids, global_seq_len)
        global_inputs = self.global_input_layer_norm(
            params["global_input_layer_norm"], global_inputs)
        q, k, v = self._blocked_qkv(params, hidden)
        side_k = self._shape(self.k(params["k"], global_inputs), b)
        side_v = self._shape(self.v(params["v"], global_inputs), b)
        num_blocks = k.shape[1]
        side_k = jnp.broadcast_to(side_k[:, None], (b, num_blocks) + side_k.shape[1:])
        side_v = jnp.broadcast_to(side_v[:, None], (b, num_blocks) + side_v.shape[1:])
        k = jnp.concatenate([k, side_k], axis=2)
        v = jnp.concatenate([v, side_v], axis=2)
        scores = jnp.einsum("bnqhd,bnkhd->bnhqk", q, k).astype(jnp.float32)
        return self._finish(params, scores, pos_bias, v, b, s)


class LongT5LayerLocalSelfAttention(Module):
    def __init__(self, config, has_bias, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.LocalSelfAttention = LongT5LocalAttention(
            config, has_bias, dtype=dtype, param_dtype=param_dtype)
        self.layer_norm = RMSNorm(config.d_model, config.layer_norm_epsilon,
                                  dtype=dtype, param_dtype=param_dtype)
        self.attn_name = "LocalSelfAttention"

    def __call__(self, params, hidden, *attn_args):
        h = self.layer_norm(params["layer_norm"], hidden)
        attn = getattr(self, self.attn_name)
        return hidden + attn(params[self.attn_name], h, *attn_args)


class LongT5LayerTransientGlobalSelfAttention(LongT5LayerLocalSelfAttention):
    def __init__(self, config, has_bias, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        self.TransientGlobalSelfAttention = LongT5TransientGlobalAttention(
            config, has_bias, dtype=dtype, param_dtype=param_dtype)
        self.layer_norm = RMSNorm(config.d_model, config.layer_norm_epsilon,
                                  dtype=dtype, param_dtype=param_dtype)
        self.attn_name = "TransientGlobalSelfAttention"


class LongT5EncoderBlock(Module):
    def __init__(self, config, has_bias, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        wrapper = (LongT5LayerLocalSelfAttention
                   if config.encoder_attention_type == "local"
                   else LongT5LayerTransientGlobalSelfAttention)
        self.layer = [wrapper(config, has_bias, **kw), T5LayerFF(config, **kw)]

    def __call__(self, params, hidden, *attn_args):
        hidden = self.layer[0](params["layer"]["0"], hidden, *attn_args)
        return self.layer[1](params["layer"]["1"], hidden)


class LongT5Stack(T5Stack):
    """Decoder: plain T5 stack.  Encoder: block-local / transient-global."""

    def make_block(self, config, i, num_layers, kw):
        if self.is_decoder:
            return super().make_block(config, i, num_layers, kw)
        return LongT5EncoderBlock(config, has_bias=(i == 0), **kw)

    def __call__(self, params, inputs_embeds, *, attention_mask=None, **kwargs):
        if self.is_decoder:
            return super().__call__(params, inputs_embeds,
                                    attention_mask=attention_mask, **kwargs)
        b, s, _ = inputs_embeds.shape
        mask_2d = (attention_mask if attention_mask is not None
                   else jnp.ones((b, s), jnp.int32))
        attn0 = self.block[0].layer[0]
        attn0_params = params["block"]["0"]["layer"]["0"][attn0.attn_name]
        block_len = getattr(attn0, attn0.attn_name).block_len
        local_bias = getattr(attn0, attn0.attn_name).compute_bias(attn0_params)
        pos_bias = local_bias + _local_mask_bias(mask_2d, block_len)
        if self.config.encoder_attention_type == "transient-global":
            block_ids, segment_ids = _make_global_fixed_block_ids(
                mask_2d, self.config.global_block_size)
            side = getattr(attn0, attn0.attn_name).compute_side_bias(
                attn0_params, mask_2d, segment_ids)       # [b,H,s,g]
            side = _split_into_blocks(side, block_len, 2)  # [b,H,nb,L,g]
            side = side.transpose(0, 2, 1, 3, 4)           # [b,nb,H,L,g]
            pos_bias = jnp.concatenate(
                [jnp.broadcast_to(pos_bias, side.shape[:4] + (pos_bias.shape[-1],)),
                 side], axis=-1)
            attn_args = (pos_bias, block_ids, segment_ids.shape[-1])
        else:
            attn_args = (pos_bias,)
        hidden = inputs_embeds
        for i, block in enumerate(self.block):
            hidden = block(params["block"][str(i)], hidden, *attn_args)
        hidden = self.final_layer_norm(params["final_layer_norm"], hidden)
        return hidden, None


class LongT5ForConditionalGeneration(T5ForConditionalGeneration):
    """reference modeling_longt5.py LongT5ForConditionalGeneration."""

    config_class = LongT5Config
    stack_cls = LongT5Stack


class LongT5EncoderModel(T5PreTrainedModel):
    config_class = LongT5Config
    _keys_to_ignore_on_load_unexpected = (r"encoder\.embed_tokens\.weight$",
                                          r"^decoder")

    def __init__(self, config: LongT5Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.shared = Embedding(config.vocab_size, config.d_model,
                                embedding_init=normal_init(1.0), **kw)
        self.encoder = LongT5Stack(config, False, config.num_layers, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, **kwargs):
        embeds = self.shared(params["shared"], input_ids)
        hidden, _ = self.encoder(params["encoder"], embeds,
                                 attention_mask=attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)
