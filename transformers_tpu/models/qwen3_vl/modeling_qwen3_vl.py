"""Qwen3-VL, TPU-native (reference models/qwen3_vl/modeling_qwen3_vl.py).

Deltas vs Qwen2.5-VL:
- vision tower: LayerNorm blocks with a learned position-embedding grid
  bilinearly resampled to each image's grid (:659 fast_pos_embed_interpolate),
  fused qkv, gelu-tanh MLP (linear_fc1/fc2 names), and **DeepStack**: patch
  mergers tap intermediate layers (:745) and their features are added back
  into the early LLM hidden states at visual token positions (:862);
- text: Qwen3 attention (per-head q/k RMSNorm) with **interleaved** M-RoPE —
  the t/h/w frequency streams interleave [THW THW ... TT] instead of being
  chunked (:299 apply_interleaved_mrope);
- get_rope_index splits videos into per-frame grids (timestamps separate
  frames, :876).

TPU-native: per-image vision attention is a host loop of static-shape
programs (cu_seqlens analog); position interpolation indices/weights are
host numpy (grids are static); deepstack adds are precomputed dense [B,S,H]
tensors so the decoder loop stays one jitted program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import cache_from_config
from ...core.module import (Embedding, LayerNorm, Linear, Module, RMSNorm,
                            normal_init)
from ...generation.utils import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from ...ops.rope import rotate_half
from ..llama.modeling_llama import LlamaDecoderLayer, LlamaModel
from ..qwen2_vl.modeling_qwen2_vl import get_rope_index
from ..qwen3.modeling_qwen3 import Qwen3Attention
from .configuration_qwen3_vl import (Qwen3VLConfig, Qwen3VLTextConfig,
                                     Qwen3VLVisionConfig)


# --------------------------------------------------------------------- vision
class Qwen3VLVisionPatchEmbed(Module):
    """Conv3d-as-matmul with bias (reference :90; qwen2's conv is bias-free)."""

    def __init__(self, config: Qwen3VLVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config

    def init(self, rng):
        c = self.config
        shape = (c.hidden_size, c.in_channels, c.temporal_patch_size, c.patch_size, c.patch_size)
        return {"proj": {"weight": normal_init(c.initializer_range)(rng, shape, self.param_dtype),
                         "bias": jnp.zeros((c.hidden_size,), self.param_dtype)}}

    def __call__(self, params, patches):  # [N, C*T*P*P]
        w = params["proj"]["weight"].astype(self.dtype)
        b = params["proj"]["bias"].astype(self.dtype)
        return jnp.dot(patches.astype(self.dtype), w.reshape(w.shape[0], -1).T) + b


class Qwen3VLVisionAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_heads
        self.head_dim = config.hidden_size // config.num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.qkv = Linear(config.hidden_size, config.hidden_size * 3, True, **kw)
        self.proj = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def __call__(self, params, hidden, cos, sin):  # hidden [N, E]
        n, e = hidden.shape
        qkv = self.qkv(params["qkv"], hidden).reshape(n, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        cos_, sin_ = cos[:, None, :], sin[:, None, :]
        q = (q.astype(jnp.float32) * cos_ + rotate_half(q.astype(jnp.float32)) * sin_).astype(self.dtype)
        k = (k.astype(jnp.float32) * cos_ + rotate_half(k.astype(jnp.float32)) * sin_).astype(self.dtype)
        out = eager_attention(q[None], k[None], v[None].astype(self.dtype),
                              is_causal=False, scale=self.head_dim**-0.5)[0]
        return self.proj(params["proj"], out.reshape(n, e))


class Qwen3VLVisionMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.linear_fc1 = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.linear_fc2 = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.linear_fc2(params["linear_fc2"],
                               self.act(self.linear_fc1(params["linear_fc1"], x)))


class Qwen3VLVisionBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm1 = LayerNorm(config.hidden_size, 1e-6, **kw)
        self.attn = Qwen3VLVisionAttention(config, **kw)
        self.norm2 = LayerNorm(config.hidden_size, 1e-6, **kw)
        self.mlp = Qwen3VLVisionMLP(config, **kw)

    def __call__(self, params, hidden, cos, sin):
        hidden = hidden + self.attn(params["attn"], self.norm1(params["norm1"], hidden), cos, sin)
        hidden = hidden + self.mlp(params["mlp"], self.norm2(params["norm2"], hidden))
        return hidden


class Qwen3VLVisionPatchMerger(Module):
    """Reference :122 — norm (pre- or post-shuffle) + 2-layer GELU MLP."""

    def __init__(self, config: Qwen3VLVisionConfig, use_postshuffle_norm, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.merged_dim = config.hidden_size * (config.spatial_merge_size**2)
        self.use_postshuffle_norm = use_postshuffle_norm
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.norm = LayerNorm(self.merged_dim if use_postshuffle_norm else config.hidden_size,
                              1e-6, dtype=dtype, param_dtype=param_dtype)
        self.linear_fc1 = Linear(self.merged_dim, self.merged_dim, True, **kw)
        self.linear_fc2 = Linear(self.merged_dim, config.out_hidden_size, True, **kw)

    def __call__(self, params, x):  # [N, E]
        if self.use_postshuffle_norm:
            h = self.norm(params["norm"], x.reshape(-1, self.merged_dim))
        else:
            h = self.norm(params["norm"], x).reshape(-1, self.merged_dim)
        h = jax.nn.gelu(self.linear_fc1(params["linear_fc1"], h), approximate=False)
        return self.linear_fc2(params["linear_fc2"], h)


class Qwen3VLVisionModel(Module):
    """Reference Qwen3VLVisionModel — returns (merged_features, deepstack list)."""

    def __init__(self, config: Qwen3VLVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.patch_embed = Qwen3VLVisionPatchEmbed(config, **kw)
        self.pos_embed = Embedding(config.num_position_embeddings, config.hidden_size,
                                   embedding_init=normal_init(config.initializer_range), **kw)
        self.num_grid_per_side = int(config.num_position_embeddings ** 0.5)
        self.blocks = [Qwen3VLVisionBlock(config, **kw) for _ in range(config.depth)]
        self.merger = Qwen3VLVisionPatchMerger(config, False, **kw)
        self.deepstack_visual_indexes = list(config.deepstack_visual_indexes)
        self.deepstack_merger_list = [Qwen3VLVisionPatchMerger(config, True, **kw)
                                      for _ in self.deepstack_visual_indexes]
        head_dim = config.hidden_size // config.num_heads
        self.rot_dim = head_dim // 2
        self.inv_freq = 1.0 / (10000.0 ** (np.arange(0, self.rot_dim, 2, dtype=np.float64) / self.rot_dim))

    def _merge_block_coords(self, grid_thw):
        """(row, col) per patch in spatial-merge-block order (reference rot_pos_emb)."""
        m = self.config.spatial_merge_size
        coords = []
        for t, h, w in grid_thw:
            hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
            hpos = hpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
            wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
            wpos = wpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
            ids = np.stack([hpos, wpos], axis=-1)
            coords.append(np.tile(ids, (t, 1)))
        return np.concatenate(coords, axis=0)  # [N, 2]

    def _pos_embed_interpolated(self, params, grid_thw):
        """Bilinear resample of the square learned grid to each image's grid,
        then reorder to merge-block order (reference fast_pos_embed_interpolate)."""
        side = self.num_grid_per_side
        m = self.config.spatial_merge_size
        outs = []
        table = params["pos_embed"]["weight"].astype(jnp.float32)
        for t, h, w in grid_thw:
            h_idx = np.linspace(0, side - 1, h)
            w_idx = np.linspace(0, side - 1, w)
            hf = h_idx.astype(np.int32)
            wf = w_idx.astype(np.int32)
            hc = np.clip(hf + 1, None, side - 1)
            wc = np.clip(wf + 1, None, side - 1)
            dh = (h_idx - hf)[:, None]
            dw = (w_idx - wf)[None, :]
            idx = np.stack([
                (hf[:, None] * side + wf[None, :]).reshape(-1),
                (hf[:, None] * side + wc[None, :]).reshape(-1),
                (hc[:, None] * side + wf[None, :]).reshape(-1),
                (hc[:, None] * side + wc[None, :]).reshape(-1)], 0)
            wgt = np.stack([
                ((1 - dh) * (1 - dw)).reshape(-1),
                ((1 - dh) * dw).reshape(-1),
                (dh * (1 - dw)).reshape(-1),
                (dh * dw).reshape(-1)], 0)
            pe = (jnp.take(table, jnp.asarray(idx.reshape(-1)), axis=0)
                  .reshape(4, h * w, -1) * jnp.asarray(wgt, jnp.float32)[:, :, None]).sum(0)
            pe = jnp.tile(pe, (t, 1))
            pe = pe.reshape(t, h // m, m, w // m, m, -1).transpose(0, 1, 3, 2, 4, 5)
            outs.append(pe.reshape(t * h * w, -1))
        return jnp.concatenate(outs, axis=0)

    def __call__(self, params, pixel_values, grid_thw: np.ndarray):
        hidden = self.patch_embed(params["patch_embed"], pixel_values)
        hidden = hidden + self._pos_embed_interpolated(params, grid_thw).astype(hidden.dtype)

        coords = self._merge_block_coords(grid_thw)
        max_grid = int(np.max(grid_thw[:, 1:]))
        table = np.outer(np.arange(max_grid, dtype=np.float64), self.inv_freq)
        angles = table[coords].reshape(coords.shape[0], -1)
        emb = np.concatenate([angles, angles], axis=-1)
        cos = jnp.asarray(np.cos(emb), jnp.float32)
        sin = jnp.asarray(np.sin(emb), jnp.float32)

        # attention segments are per FRAME (reference vision_utils.
        # get_vision_cu_seqlens default: h*w per frame, t segments per entry)
        lengths = [int(h * w) for t, h, w in grid_thw for _ in range(int(t))]
        per_image = []
        start = 0
        for n in lengths:
            h_img = hidden[start:start + n]
            cos_i, sin_i = cos[start:start + n], sin[start:start + n]
            states = []
            for i, block in enumerate(self.blocks):
                h_img = block(params["blocks"][str(i)], h_img, cos_i, sin_i)
                if i in self.deepstack_visual_indexes:
                    states.append(h_img)
            per_image.append((h_img, states))
            start += n
        hidden = jnp.concatenate([h for h, _ in per_image], axis=0)
        deepstack = []
        for k in range(len(self.deepstack_visual_indexes)):
            feats = jnp.concatenate([st[k] for _, st in per_image], axis=0)
            deepstack.append(self.deepstack_merger_list[k](
                params["deepstack_merger_list"][str(k)], feats))
        return self.merger(params["merger"], hidden), deepstack


# ----------------------------------------------------------------------- text
class Qwen3VLTextDecoderLayer(LlamaDecoderLayer):
    """Standard Qwen3 block + DeepStack injection: visual features tapped at
    vision layer k are added at visual token positions after decoder layer k
    (reference :862) — realized here as an add at the START of layer k+1."""

    attention_cls = Qwen3Attention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.layer_idx = layer_idx
        self._deepstack_add = None

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        if self._deepstack_add is not None:
            hidden = hidden + self._deepstack_add.astype(hidden.dtype)
        return super().__call__(params, hidden, cos, sin, attn_args, cache, cache_position)


class Qwen3VLTextModel(LlamaModel):
    """Qwen3 skeleton + interleaved M-RoPE (reference apply_interleaved_mrope)."""

    decoder_layer_cls = Qwen3VLTextDecoderLayer

    def compute_rope(self, position_ids):
        if position_ids.ndim == 2:
            position_ids = jnp.broadcast_to(position_ids[None], (3, *position_ids.shape))
        inv = jnp.asarray(self.inv_freq, jnp.float32)  # [D/2]
        freqs = position_ids[..., None].astype(jnp.float32) * inv  # [3, B, S, D/2]
        section = self.config.mrope_section
        mixed = freqs[0]
        for dim, offset in ((1, 1), (2, 2)):
            length = section[dim] * 3
            idx = jnp.arange(offset, length, 3)
            mixed = mixed.at[..., idx].set(freqs[dim][..., idx])
        emb = jnp.concatenate([mixed, mixed], axis=-1)
        scale = self.attention_scaling
        return (jnp.cos(emb) * scale).astype(self.dtype), (jnp.sin(emb) * scale).astype(self.dtype)


# ------------------------------------------------------------------ composite
class Qwen3VLModel(Module):
    text_model_cls = Qwen3VLTextModel

    def __init__(self, config: Qwen3VLConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.visual = Qwen3VLVisionModel(config.vision_config, **kw)
        self.language_model = self.text_model_cls(config.text_config, **kw)

    def embed_with_images(self, params, input_ids, pixel_values, image_grid_thw,
                          pixel_values_videos=None, video_grid_thw=None):
        """Returns (inputs_embeds, deepstack_adds or None)."""
        is_img = input_ids == self.config.image_token_id
        is_vid = input_ids == self.config.video_token_id
        mask = is_img | is_vid
        embeds = self.language_model.embed_tokens(
            params["language_model"]["embed_tokens"], jnp.where(mask, 0, input_ids))
        feats_list, deep_list = [], []
        if pixel_values is not None:
            f, d = self.visual(params["visual"], pixel_values, np.asarray(image_grid_thw))
            feats_list.append(f)
            deep_list.append(d)
        if pixel_values_videos is not None:
            f, d = self.visual(params["visual"], pixel_values_videos, np.asarray(video_grid_thw))
            feats_list.append(f)
            deep_list.append(d)
        if not feats_list:
            return embeds, None
        feats = jnp.concatenate(feats_list, axis=0)
        deepstack = [jnp.concatenate([d[k] for d in deep_list], axis=0)
                     for k in range(len(deep_list[0]))]
        order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
        idx = jnp.clip(order, 0, feats.shape[0] - 1)
        gathered = jnp.take(feats.astype(embeds.dtype), idx, axis=0).reshape(embeds.shape)
        embeds = jnp.where(mask[..., None], gathered, embeds)
        adds = []
        for d in deepstack:
            g = jnp.take(d, idx, axis=0).reshape(*embeds.shape[:2], d.shape[-1])
            adds.append(jnp.where(mask[..., None], g, 0.0))
        return embeds, adds


class Qwen3VLPreTrainedModel(PreTrainedModel):
    config_class = Qwen3VLConfig
    base_model_prefix = "model"


class Qwen3VLForConditionalGeneration(Qwen3VLPreTrainedModel, GenerationMixin):
    """Reference Qwen3VLForConditionalGeneration."""

    _prefill_input_names = ("pixel_values", "pixel_values_videos")
    _static_prefill_input_names = ("image_grid_thw", "video_grid_thw")
    model_cls = Qwen3VLModel

    def __init__(self, config: Qwen3VLConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = self.model_cls(config, dtype=self.dtype, param_dtype=self.param_dtype)
        text = config.text_config
        if not text.tie_word_embeddings:
            self.lm_head = Linear(text.hidden_size, text.vocab_size, False, dtype=self.dtype,
                                  param_dtype=self.param_dtype, kernel_init=normal_init(0.02))

    def get_input_embedding_path(self):
        return "model.language_model.embed_tokens.weight"

    def compute_logits(self, params, hidden):
        if self.config.text_config.tie_word_embeddings:
            return self.model.language_model.embed_tokens.attend(
                params["model"]["language_model"]["embed_tokens"], hidden)
        return self.lm_head(params["lm_head"], hidden)

    @staticmethod
    def _split_video_grids(video_grid_thw):
        """Videos are split into per-frame grids (reference get_rope_index:876)."""
        if video_grid_thw is None:
            return None
        g = np.asarray(video_grid_thw)
        g = np.repeat(g, g[:, 0], axis=0)
        g[:, 0] = 1
        return g

    def _prepare_generation_positions(self, input_ids, attention_mask, **model_kwargs):
        grid = model_kwargs.get("image_grid_thw")
        vgrid = self._split_video_grids(model_kwargs.get("video_grid_thw"))
        pos, deltas = get_rope_index(self.config, np.asarray(input_ids),
                                     None if grid is None else np.asarray(grid),
                                     vgrid, np.asarray(attention_mask))
        s = input_ids.shape[1]
        rope_last = (deltas[:, 0] + s - 1).astype(np.int32)
        return jnp.asarray(pos, jnp.int32), jnp.asarray(rope_last)

    def __call__(self, params, input_ids=None, pixel_values=None, image_grid_thw=None,
                 pixel_values_videos=None, video_grid_thw=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        adds = None
        if inputs_embeds is None:
            inputs_embeds, adds = self.model.embed_with_images(
                params["model"], input_ids, pixel_values, image_grid_thw,
                pixel_values_videos, video_grid_thw)
        if position_ids is None and input_ids is not None and past_key_values is None:
            grid = None if image_grid_thw is None else np.asarray(image_grid_thw)
            vgrid = self._split_video_grids(video_grid_thw)
            mask = None if attention_mask is None else np.asarray(attention_mask)
            pos, _ = get_rope_index(self.config, np.asarray(input_ids), grid, vgrid, mask)
            position_ids = jnp.asarray(pos)
        layers = self.model.language_model.layers
        try:
            if adds is not None:
                for j, layer in enumerate(layers):
                    if 1 <= j <= len(adds):
                        layer._deepstack_add = adds[j - 1]
            outputs = self.model.language_model(
                params["model"]["language_model"], None, attention_mask, position_ids,
                past_key_values, cache_position, inputs_embeds, output_hidden_states)
        finally:
            for layer in layers:
                layer._deepstack_add = None
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.text_config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      past_key_values=outputs.past_key_values,
                                      hidden_states=outputs.hidden_states)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        return cache_from_config(self.config.text_config, batch_size, max_len,
                                 dtype or self.dtype, implementation=implementation)
