"""Reformer — LSH + local chunked attention with reversible residuals,
TPU-native (reference src/transformers/models/reformer/modeling_reformer.py).

Full-forward design notes:
- LSH bucketing (reference _hash_vectors :697) draws random rotations with
  torch.manual_seed(config.hash_seed) on EVERY call. When ``hash_seed`` is
  set we precompute the identical rotations once at build time (via the
  torch CPU generator — init-time only, nothing torch in the jit path);
  when unset the reference itself is nondeterministic and we draw from a
  fixed jax key.
- The pad-bucket branch (reference :749) is taken whenever a mask is given
  (the reference checks mask.sum() at runtime). Bucket VALUES then differ by
  an offset when the mask has no zeros, but the sort ORDER — the only thing
  buckets feed — is unchanged, so attention outputs are identical.
- Reversible residuals are a memory trick for torch backprop; under jax we
  run the same two-stream forward (Y1 = X1 + Attn(X2), Y2 = X2 + FF(Y1))
  and let autodiff/remat handle memory.
- Greedy generation re-runs the full (jitted, per-length) forward; the
  reference's one-token bucket cache trades exactness bookkeeping for speed
  on GPU and is unnecessary at Reformer's typical offline lengths.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import reduce
from operator import mul
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ..bart.modeling_bart import get_activation
from .configuration_reformer import ReformerConfig

MASK_VALUE = -1e9
SELF_MASK_VALUE = -1e5


@dataclass
class ReformerModelOutput(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None


@dataclass
class ReformerLMOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None


def _lcm_chunk_len(config):
    kinds = set(config.attn_layers)
    if kinds == {"lsh"}:
        return config.lsh_attn_chunk_length
    if kinds == {"local"}:
        return config.local_attn_chunk_length
    return int(np.lcm(config.lsh_attn_chunk_length, config.local_attn_chunk_length))


def _min_chunk_len(config):
    kinds = set(config.attn_layers)
    if kinds == {"lsh"}:
        return config.lsh_attn_chunk_length
    if kinds == {"local"}:
        return config.local_attn_chunk_length
    return min(config.lsh_attn_chunk_length, config.local_attn_chunk_length)


def _stable_argsort(vector):
    """reference :151 — scale so plain argsort is stable; jnp.argsort is
    stable anyway, but the scaled values keep tie behavior identical."""
    n = vector.shape[-1]
    offset = jnp.arange(n) % n
    return jnp.argsort(n * vector + offset, axis=-1)


def _look_adjacent(vectors, before, after):
    """Concat neighbor chunks on the chunk-content axis (reference :362)."""
    if before == 0 and after == 0:
        return vectors
    slices = []
    for i in range(-before, after + 1):
        if i == 0:
            slices.append(vectors)
        else:
            slices.append(jnp.concatenate(
                [vectors[:, :, i:], vectors[:, :, :i]], axis=2))
    return jnp.concatenate(slices, axis=3)


def _split_heads(x, heads, head_size):
    b, s, _ = x.shape
    return jnp.swapaxes(x.reshape(b, s, heads, head_size), 1, 2)


def _merge_heads(x):
    b, h, s, d = x.shape
    return jnp.swapaxes(x, 1, 2).reshape(b, s, h * d)


class AxialPositionEmbeddings(Module):
    """Factorized positions over axial_pos_shape (reference :192)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.shape = tuple(config.axial_pos_shape)
        self.dims = tuple(config.axial_pos_embds_dim)
        self.std = config.axial_norm_std
        if sum(self.dims) != config.hidden_size:
            raise ValueError("axial_pos_embds_dim must sum to hidden_size")

    def init(self, rng):
        weights = {}
        keys = jax.random.split(rng, len(self.dims))
        for axis, (key, dim) in enumerate(zip(keys, self.dims)):
            ax_shape = [1] * len(self.shape)
            ax_shape[axis] = self.shape[axis]
            weights[str(axis)] = (jax.random.normal(key, tuple(ax_shape) + (dim,),
                                                    self.param_dtype) * self.std)
        return {"weights": weights}

    def __call__(self, params, position_ids):
        b, s = position_ids.shape
        total = reduce(mul, self.shape)
        encodings = []
        for axis in range(len(self.dims)):
            w = params["weights"][str(axis)].astype(self.dtype)
            w = jnp.broadcast_to(w, self.shape + (self.dims[axis],))
            encodings.append(w.reshape(total, self.dims[axis]))
        table = jnp.concatenate(encodings, axis=-1)  # [prod(shape), hidden]
        return jnp.take(table, position_ids, axis=0)


class ReformerPositionEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.embedding = Embedding(config.max_position_embeddings, config.hidden_size,
                                   dtype=dtype, param_dtype=param_dtype,
                                   embedding_init=normal_init(config.initializer_range))

    def __call__(self, params, position_ids):
        return self.embedding(params["embedding"], position_ids)


class ReformerEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size,
                                         embedding_init=normal_init(config.initializer_range), **kw)
        if config.axial_pos_embds:
            self.position_embeddings = AxialPositionEmbeddings(config, **kw)
        else:
            self.position_embeddings = ReformerPositionEmbeddings(config, **kw)

    def __call__(self, params, input_ids, start_idx=0):
        b, s = input_ids.shape
        pos_ids = jnp.broadcast_to(jnp.arange(start_idx, start_idx + s), (b, s))
        embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        return embeds + self.position_embeddings(params["position_embeddings"], pos_ids)


def _len_norm(x, epsilon=1e-6):
    variance = jnp.mean(jnp.square(x), -1, keepdims=True)
    return x * jax.lax.rsqrt(variance + epsilon)


class LSHSelfAttention(Module):
    """reference :415 (full-forward path)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.chunk_length = config.lsh_attn_chunk_length
        self.num_hashes = config.num_hashes
        self.num_chunks_before = config.lsh_num_chunks_before
        self.num_chunks_after = config.lsh_num_chunks_after
        self.is_decoder = config.is_decoder
        self.heads = config.num_attention_heads
        self.head_size = config.attention_head_size
        all_head = self.heads * self.head_size
        self.query_key = Linear(config.hidden_size, all_head, use_bias=False, **kw)
        self.value = Linear(config.hidden_size, all_head, use_bias=False, **kw)
        self._rotation_cache = {}

    # --------------------------------------------------------------- hashing
    def _num_buckets(self, sequence_length):
        nb = self.config.num_buckets
        if nb is not None:
            return nb
        # reference _set_num_buckets :790
        pow2 = (2 * (sequence_length // self.chunk_length)).bit_length() - 1
        nb = 2**pow2
        limit = 2 * max(int((self.config.max_position_embeddings
                             // self.chunk_length) ** 0.5), self.chunk_length)
        if nb > limit:
            nb = [2 ** (pow2 // 2), 2 ** (pow2 - pow2 // 2)]
        self.config.num_buckets = nb
        return nb

    def _rotations(self, num_buckets, num_hashes):
        rotation_size = num_buckets if isinstance(num_buckets, int) else sum(num_buckets)
        shape = (self.heads, self.head_size, num_hashes, rotation_size // 2)
        key = (shape, self.config.hash_seed)
        if key not in self._rotation_cache:
            if self.config.hash_seed is not None:
                # replicate torch.manual_seed(hash_seed); torch.randn(shape)
                import torch

                torch.manual_seed(self.config.hash_seed)
                rot = torch.randn(shape, dtype=torch.float32).numpy()
            else:
                rot = np.asarray(jax.random.normal(jax.random.key(0), shape, jnp.float32))
            # cache HOST numpy — caching a jnp array created under jit would
            # leak a tracer into later traces
            self._rotation_cache[key] = rot
        return jnp.asarray(self._rotation_cache[key])

    def _hash_vectors(self, vectors, num_hashes, attention_mask):
        """reference :697; see module docstring for the pad-bucket note."""
        b = vectors.shape[0]
        num_buckets = self.config.num_buckets
        rotations = self._rotations(num_buckets, num_hashes).astype(vectors.dtype)
        rotated = jnp.einsum("bmtd,mdhr->bmhtr", vectors, rotations)
        if isinstance(num_buckets, int) or len(num_buckets) == 1:
            rotated = jnp.concatenate([rotated, -rotated], axis=-1)
            buckets = jnp.argmax(rotated, axis=-1)
            total_buckets = num_buckets if isinstance(num_buckets, int) else num_buckets[0]
        else:
            buckets, cur_sum, cur_product = None, 0, 1
            total_buckets = 1
            for factor in num_buckets:
                rv = rotated[..., cur_sum : cur_sum + factor // 2]
                cur_sum += factor // 2
                rv = jnp.concatenate([rv, -rv], axis=-1)
                if buckets is None:
                    buckets = jnp.argmax(rv, axis=-1)
                else:
                    buckets = buckets + cur_product * jnp.argmax(rv, axis=-1)
                cur_product *= factor
                total_buckets *= factor
        if attention_mask is not None:
            total_buckets = total_buckets + 1
            keep = attention_mask.astype(bool)[:, None, None, :]
            buckets = jnp.where(keep, buckets, total_buckets - 1)
        offsets = (jnp.arange(num_hashes) * total_buckets)[None, None, :, None]
        return (buckets + offsets).reshape(b, self.heads, -1)

    # ---------------------------------------------------------------- attend
    def __call__(self, params, hidden, attention_mask=None):
        cfg = self.config
        b, s, _ = hidden.shape
        num_hashes = self.num_hashes
        qk = _split_heads(self.query_key(params["query_key"], hidden),
                          self.heads, self.head_size)
        v = _split_heads(self.value(params["value"], hidden),
                         self.heads, self.head_size)
        do_standard = s <= self.chunk_length

        if not do_standard:
            self._num_buckets(s)
            buckets = self._hash_vectors(qk, num_hashes, attention_mask)
            sorted_idx = _stable_argsort(buckets)
            undo_idx = jnp.argsort(sorted_idx, axis=-1)
            sorted_per_hash = sorted_idx % s
            def gather(x):
                expanded = jnp.broadcast_to(
                    sorted_per_hash[..., None],
                    sorted_per_hash.shape + (self.head_size,))
                return jnp.take_along_axis(jnp.tile(x, (1, 1, num_hashes, 1)),
                                           expanded, axis=2)
            qk_s = gather(qk)
            v_s = gather(v)
            n_chunks = num_hashes * s // self.chunk_length
            qk_s = qk_s.reshape(b, self.heads, n_chunks, self.chunk_length, self.head_size)
            v_s = v_s.reshape(b, self.heads, n_chunks, self.chunk_length, self.head_size)
            query_idx = sorted_per_hash.reshape(b, self.heads, n_chunks, self.chunk_length)
            key_idx = _look_adjacent(query_idx[..., None],
                                     self.num_chunks_before, self.num_chunks_after)[..., 0]
            key_vectors = _look_adjacent(_len_norm(qk_s) / math.sqrt(self.head_size),
                                         self.num_chunks_before, self.num_chunks_after)
            value_vectors = _look_adjacent(v_s, self.num_chunks_before, self.num_chunks_after)
            query_vectors = qk_s
        else:
            sorted_per_hash = jnp.broadcast_to(jnp.arange(s), (b, self.heads, s))
            query_idx = key_idx = sorted_per_hash
            key_vectors = _len_norm(qk) / math.sqrt(self.head_size)
            value_vectors = v
            query_vectors = qk

        dots = jnp.einsum("...tc,...sc->...ts", query_vectors, key_vectors)

        mask = None
        if attention_mask is not None:
            am = attention_mask.astype(bool)
            if not do_standard:
                am = jnp.broadcast_to(am[:, None, None, :],
                                      key_idx.shape[:2] + (key_idx.shape[2], s))
                am = jnp.take_along_axis(am, key_idx, axis=-1)
            else:
                am = jnp.broadcast_to(am[:, None, :], key_idx.shape)
            mask = jnp.broadcast_to(am[..., None, :], dots.shape)
        if self.is_decoder:
            causal = query_idx[..., None] >= key_idx[..., None, :]
            mask = causal if mask is None else (causal & mask)
        if mask is not None:
            dots = jnp.where(mask, dots, MASK_VALUE)
        self_mask = query_idx[..., None] != key_idx[..., None, :]
        dots = jnp.where(self_mask, dots, SELF_MASK_VALUE)

        logits = jax.scipy.special.logsumexp(dots, axis=-1, keepdims=True)
        probs = jnp.exp(dots - logits)
        out = jnp.einsum("...ts,...sc->...tc", probs, value_vectors)

        if not do_standard:
            out = out.reshape(b, self.heads, num_hashes * s, self.head_size)
            logits = logits.reshape(b, self.heads, num_hashes * s)
            # undo the bucket sort (reference ReverseSort :1077)
            out = jnp.take_along_axis(
                out, jnp.broadcast_to(undo_idx[..., None], undo_idx.shape
                                      + (self.head_size,)), axis=2)
            logits = jnp.take_along_axis(logits, undo_idx, axis=2)
            if num_hashes > 1:
                out = out.reshape(b, self.heads, num_hashes, s, self.head_size)
                logits = logits.reshape(b, self.heads, num_hashes, s)[..., None]
                w = jnp.exp(logits - jax.scipy.special.logsumexp(logits, axis=2,
                                                                 keepdims=True))
                out = jnp.sum(out * w, axis=2)
            else:
                out = out.reshape(b, self.heads, s, self.head_size)
        return _merge_heads(out)


class LocalSelfAttention(Module):
    """reference :1109."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.chunk_length = config.local_attn_chunk_length
        self.num_chunks_before = config.local_num_chunks_before
        self.num_chunks_after = config.local_num_chunks_after
        self.is_decoder = config.is_decoder
        self.heads = config.num_attention_heads
        self.head_size = config.attention_head_size
        all_head = self.heads * self.head_size
        self.query = Linear(config.hidden_size, all_head, use_bias=False, **kw)
        self.key = Linear(config.hidden_size, all_head, use_bias=False, **kw)
        self.value = Linear(config.hidden_size, all_head, use_bias=False, **kw)

    def __call__(self, params, hidden, attention_mask=None):
        b, s, _ = hidden.shape
        q = _split_heads(self.query(params["query"], hidden), self.heads, self.head_size)
        k = _split_heads(self.key(params["key"], hidden), self.heads, self.head_size)
        v = _split_heads(self.value(params["value"], hidden), self.heads, self.head_size)
        k = k / math.sqrt(self.head_size)
        indices = jnp.broadcast_to(jnp.arange(s), (b, self.heads, s))
        do_standard = s <= self.chunk_length

        if not do_standard:
            n_chunks = s // self.chunk_length
            shape5 = (b, self.heads, n_chunks, self.chunk_length, self.head_size)
            q = q.reshape(shape5)
            k = _look_adjacent(k.reshape(shape5), self.num_chunks_before, self.num_chunks_after)
            v = _look_adjacent(v.reshape(shape5), self.num_chunks_before, self.num_chunks_after)
            query_idx = indices.reshape(b, self.heads, n_chunks, self.chunk_length)
            key_idx = _look_adjacent(query_idx[..., None],
                                     self.num_chunks_before, self.num_chunks_after)[..., 0]
        else:
            query_idx = key_idx = indices

        dots = jnp.einsum("...tc,...sc->...ts", q, k)

        mask = None
        if attention_mask is not None:
            am = attention_mask.astype(bool)
            if not do_standard:
                am = am.reshape(b, 1, s // self.chunk_length, self.chunk_length)
                am = _look_adjacent(am[..., None], self.num_chunks_before,
                                    self.num_chunks_after)[..., 0]
                mask = jnp.broadcast_to(am[..., None, :], dots.shape)
            else:
                mask = jnp.broadcast_to(am[:, None, None, :], dots.shape)
        if self.is_decoder:
            causal = query_idx[..., None] >= key_idx[..., None, :]
            mask = causal if mask is None else (causal & mask)
        if mask is not None:
            dots = jnp.where(mask, dots, MASK_VALUE)

        logits = jax.scipy.special.logsumexp(dots, axis=-1, keepdims=True)
        probs = jnp.exp(dots - logits)
        out = jnp.einsum("...ts,...sc->...tc", probs, v)
        if not do_standard:
            out = out.reshape(b, self.heads, s, self.head_size)
        return _merge_heads(out)


class ReformerSelfOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        all_head = config.num_attention_heads * config.attention_head_size
        self.dense = Linear(all_head, config.hidden_size, use_bias=False,
                            dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        return self.dense(params["dense"], x)


class ReformerAttention(Module):
    def __init__(self, config, layer_id, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        kinds = set(config.attn_layers)
        if kinds == {"lsh"} or (kinds == {"lsh", "local"}
                                and config.attn_layers[layer_id] == "lsh"):
            self.self_attention = LSHSelfAttention(config, **kw)
        elif kinds <= {"lsh", "local"}:
            self.self_attention = LocalSelfAttention(config, **kw)
        else:
            raise NotImplementedError(f"attn_layers {config.attn_layers}")
        self.output = ReformerSelfOutput(config, **kw)

    def __call__(self, params, hidden, attention_mask=None):
        h = self.layer_norm(params["layer_norm"], hidden)
        h = self.self_attention(params["self_attention"], h, attention_mask)
        return self.output(params["output"], h)


class ChunkReformerFeedForward(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.dense = _FFDense(config, **kw)
        self.output = _FFOutput(config, **kw)

    def __call__(self, params, x):
        h = self.layer_norm(params["layer_norm"], x)
        h = self.dense(params["dense"], h)
        return self.output(params["output"], h)


class _FFDense(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.feed_forward_size,
                            dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.act(self.dense(params["dense"], x))


class _FFOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.feed_forward_size, config.hidden_size,
                            dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        return self.dense(params["dense"], x)


class ReformerLayer(Module):
    def __init__(self, config, layer_id, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = ReformerAttention(config, layer_id, **kw)
        self.feed_forward = ChunkReformerFeedForward(config, **kw)

    def __call__(self, params, prev_attn_output, hidden, attention_mask=None):
        # RevNet: Y1 = X1 + f(X2); Y2 = X2 + g(Y1) (reference :1535)
        attn = self.attention(params["attention"], hidden, attention_mask)
        attn_output = prev_attn_output + attn
        hidden = hidden + self.feed_forward(params["feed_forward"], attn_output)
        return attn_output, hidden


class ReformerEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layers = [ReformerLayer(config, i, **kw)
                       for i in range(len(config.attn_layers))]
        self.layer_norm = LayerNorm(2 * config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, attention_mask=None):
        attn_output = hidden
        for i, layer in enumerate(self.layers):
            attn_output, hidden = layer(params["layers"][str(i)], attn_output,
                                        hidden, attention_mask)
        concat = jnp.concatenate([attn_output, hidden], axis=-1)
        return self.layer_norm(params["layer_norm"], concat)


class ReformerPreTrainedModel(PreTrainedModel):
    config_class = ReformerConfig
    base_model_prefix = "reformer"


class _ReformerCore(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.embeddings = ReformerEmbeddings(config, **kw)
        self.encoder = ReformerEncoder(config, **kw)

    def __call__(self, params, input_ids, attention_mask=None):
        cfg = self.config
        b, orig_len = input_ids.shape
        lcm = _lcm_chunk_len(cfg)
        must_pad = orig_len % lcm != 0 and orig_len > _min_chunk_len(cfg)
        if must_pad:
            pad = lcm - orig_len % lcm
            input_ids = jnp.concatenate(
                [input_ids, jnp.full((b, pad), cfg.pad_token_id, input_ids.dtype)], 1)
            if attention_mask is None:
                attention_mask = jnp.ones((b, orig_len), jnp.int32)
            attention_mask = jnp.concatenate(
                [attention_mask, jnp.zeros((b, pad), attention_mask.dtype)], 1)
        h = self.embeddings(params["embeddings"], input_ids)
        h = self.encoder(params["encoder"], h, attention_mask)
        return h[:, :orig_len]


class ReformerModel(ReformerPreTrainedModel):
    def __init__(self, config: ReformerConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.reformer = _ReformerCore(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, input_ids=None, attention_mask=None, **kwargs):
        h = self.reformer(params["reformer"], input_ids, attention_mask)
        return ReformerModelOutput(last_hidden_state=h)


class _ReformerWithCore(ReformerPreTrainedModel):
    def __init__(self, config: ReformerConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.reformer = _ReformerCore(config, **kw)
        self._build_head(config, **kw)


class ReformerOnlyLMHead(Module):
    """decoder Linear(2H, V, no bias); the checkpoint's separate ``bias``
    param exists but the reference forward never adds it (reference :1831)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.vocab_size = config.vocab_size
        self.decoder = Linear(2 * config.hidden_size, config.vocab_size,
                              use_bias=False, dtype=dtype, param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        params["bias"] = jnp.zeros((self.vocab_size,), self.param_dtype)
        return params

    def __call__(self, params, hidden):
        return self.decoder(params["decoder"], hidden)


class ReformerModelWithLMHead(_ReformerWithCore):
    def _build_head(self, config, **kw):
        if not config.is_decoder:
            raise ValueError("ReformerModelWithLMHead requires is_decoder=True")
        self.lm_head = ReformerOnlyLMHead(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, labels=None, **kwargs):
        h = self.reformer(params["reformer"], input_ids, attention_mask)
        logits = self.lm_head(params["lm_head"], h)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return ReformerLMOutput(loss=loss, logits=logits)

    def generate(self, params=None, input_ids=None, attention_mask=None,
                 max_new_tokens=20, do_sample=False, **kwargs):
        params = params if params is not None else self.params
        if do_sample:
            raise NotImplementedError("Reformer generate: greedy only")
        ids = np.asarray(input_ids)
        eos = self.config.eos_token_id
        finished = np.zeros((ids.shape[0],), bool)
        fwd = jax.jit(lambda p, i: self(p, input_ids=i).logits)
        for _ in range(max_new_tokens):
            logits = fwd(params, jnp.asarray(ids))
            nxt = np.asarray(jnp.argmax(logits[:, -1, :], -1)).astype(ids.dtype)
            nxt = np.where(finished, self.config.pad_token_id or 0, nxt)
            ids = np.concatenate([ids, nxt[:, None]], axis=1)
            if eos is not None:
                finished |= nxt == eos
                if finished.all():
                    break
        return jnp.asarray(ids)


class ReformerForMaskedLM(_ReformerWithCore):
    def _build_head(self, config, **kw):
        if config.is_decoder:
            raise ValueError("ReformerForMaskedLM requires is_decoder=False")
        self.lm_head = ReformerOnlyLMHead(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, labels=None, **kwargs):
        h = self.reformer(params["reformer"], input_ids, attention_mask)
        logits = self.lm_head(params["lm_head"], h)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return ReformerLMOutput(loss=loss, logits=logits)


class ReformerClassificationHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(2 * config.hidden_size, config.hidden_size, **kw)
        self.out_proj = Linear(config.hidden_size, config.num_labels, **kw)

    def __call__(self, params, hidden):
        h = hidden[:, 0, :]
        h = jnp.tanh(self.dense(params["dense"], h))
        return self.out_proj(params["out_proj"], h)


class ReformerForSequenceClassification(_ReformerWithCore):
    def _build_head(self, config, **kw):
        self.classifier = ReformerClassificationHead(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, labels=None, **kwargs):
        h = self.reformer(params["reformer"], input_ids, attention_mask)
        logits = self.classifier(params["classifier"], h)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ReformerLMOutput(loss=loss, logits=logits)


class ReformerForQuestionAnswering(_ReformerWithCore):
    def _build_head(self, config, **kw):
        self.qa_outputs = Linear(2 * config.hidden_size, 2, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 start_positions=None, end_positions=None, **kwargs):
        from ...modeling_outputs import QuestionAnsweringModelOutput

        h = self.reformer(params["reformer"], input_ids, attention_mask)
        logits = self.qa_outputs(params["qa_outputs"], h)
        start_logits, end_logits = logits[..., 0], logits[..., 1]
        loss = None
        if start_positions is not None and end_positions is not None:
            from ...loss import for_question_answering_loss

            loss = for_question_answering_loss(start_logits, end_logits,
                                               start_positions, end_positions)
        return QuestionAnsweringModelOutput(loss=loss, start_logits=start_logits,
                                            end_logits=end_logits)
