"""GLM-4V, TPU-native (reference models/glm4v/modeling_glm4v.py).

- Vision: Conv3d patch embed + RMSNorm blocks with SiLU-gated MLPs; a learned
  square position grid resampled per image by **bicubic** grid_sample (:145,
  torch semantics A=-0.75, align_corners=False, border padding — reproduced
  exactly on host since grids are static); after the blocks a strided Conv2d
  ``downsample`` merges each spatial_merge block, then a gated PatchMerger.
- Text: GLM-4 sandwich-norm decoder (post_self_attn / post_mlp norms) with
  chunked M-RoPE sections applied in the GLM interleaved convention
  (:433 apply_multimodal_rotary_pos_emb — halve, repeat_interleave, rotate
  pairs); q/k/v biased, o_proj bias-free.
- get_rope_index: images are contiguous image-token runs; video frames are
  grouped by video_start/end flags with per-frame time steps (:960).
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
from ..glm.modeling_glm import GlmAttention
from ..glm4.modeling_glm4 import Glm4DecoderLayer
from ..llama.modeling_llama import LlamaModel
from .configuration_glm4v import Glm4vConfig, Glm4vTextConfig, Glm4vVisionConfig


def _cubic_weights(t: np.ndarray, A: float = -0.75):
    """torch grid_sample bicubic tap weights (cubic convolution, A=-0.75)."""
    w0 = ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A
    w1 = ((A + 2) * t - (A + 3)) * t * t + 1
    w2 = ((A + 2) * (1 - t) - (A + 3)) * (1 - t) * (1 - t) + 1
    w3 = 1.0 - w0 - w1 - w2
    return np.stack([w0, w1, w2, w3], axis=-1)  # [..., 4]


def bicubic_border_sample_plan(side: int, norm_x: np.ndarray, norm_y: np.ndarray):
    """Host plan for F.grid_sample(..., mode='bicubic', align_corners=False,
    padding_mode='border') on a [side, side] grid: returns flat indices
    [N, 16] and weights [N, 16]."""
    ix = ((norm_x + 1) * side - 1) / 2
    iy = ((norm_y + 1) * side - 1) / 2
    x0 = np.floor(ix)
    y0 = np.floor(iy)
    wx = _cubic_weights(ix - x0)  # [N, 4]
    wy = _cubic_weights(iy - y0)
    xs = np.stack([x0 - 1, x0, x0 + 1, x0 + 2], axis=-1)
    ys = np.stack([y0 - 1, y0, y0 + 1, y0 + 2], axis=-1)
    xs = np.clip(xs, 0, side - 1).astype(np.int64)
    ys = np.clip(ys, 0, side - 1).astype(np.int64)
    idx = (ys[:, :, None] * side + xs[:, None, :]).reshape(-1, 16)
    wgt = (wy[:, :, None] * wx[:, None, :]).reshape(-1, 16)
    return idx, wgt


# --------------------------------------------------------------------- vision
class Glm4vVisionPatchEmbed(Module):
    def __init__(self, config: Glm4vVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config

    def init(self, rng):
        c = self.config
        shape = (c.hidden_size, c.in_channels, c.temporal_patch_size, c.patch_size, c.patch_size)
        return {"proj": {"weight": normal_init(c.initializer_range)(rng, shape, self.param_dtype),
                         "bias": jnp.zeros((c.hidden_size,), self.param_dtype)}}

    def __call__(self, params, patches):  # [N, C*T*P*P]
        w = params["proj"]["weight"].astype(self.dtype)
        return (jnp.dot(patches.astype(self.dtype), w.reshape(w.shape[0], -1).T)
                + params["proj"]["bias"].astype(self.dtype))


class Glm4vVisionAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_heads
        self.head_dim = config.hidden_size // config.num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.qkv = Linear(config.hidden_size, config.hidden_size * 3,
                          config.attention_bias, **kw)
        self.proj = Linear(config.hidden_size, config.hidden_size, False, **kw)

    def __call__(self, params, hidden, cos, sin):
        n, e = hidden.shape
        qkv = self.qkv(params["qkv"], hidden).reshape(n, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        cos_, sin_ = cos[:, None, :], sin[:, None, :]
        q = (q.astype(jnp.float32) * cos_ + rotate_half(q.astype(jnp.float32)) * sin_).astype(self.dtype)
        k = (k.astype(jnp.float32) * cos_ + rotate_half(k.astype(jnp.float32)) * sin_).astype(self.dtype)
        out = eager_attention(q[None], k[None], v[None].astype(self.dtype),
                              is_causal=False, scale=self.head_dim**-0.5)[0]
        return self.proj(params["proj"], out.reshape(n, e))


class Glm4vVisionMlp(Module):
    """SiLU-gated; intermediate = out_hidden_size (reference :67)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.gate_proj = Linear(config.hidden_size, config.out_hidden_size, False, **kw)
        self.up_proj = Linear(config.hidden_size, config.out_hidden_size, False, **kw)
        self.down_proj = Linear(config.out_hidden_size, config.hidden_size, False, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.down_proj(params["down_proj"],
                              self.act(self.gate_proj(params["gate_proj"], x))
                              * self.up_proj(params["up_proj"], x))


class Glm4vVisionBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm1 = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.attn = Glm4vVisionAttention(config, **kw)
        self.norm2 = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.mlp = Glm4vVisionMlp(config, **kw)

    def __call__(self, params, hidden, cos, sin):
        hidden = hidden + self.attn(params["attn"], self.norm1(params["norm1"], hidden), cos, sin)
        hidden = hidden + self.mlp(params["mlp"], self.norm2(params["norm2"], hidden))
        return hidden


class Glm4vVisionPatchMerger(Module):
    """proj → LayerNorm → GELU → SiLU-gated MLP (reference :115)."""

    def __init__(self, dim, context_dim, hidden_act, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.proj = Linear(dim, dim, False, **kw)
        self.post_projection_norm = LayerNorm(dim, 1e-5, dtype=dtype, param_dtype=param_dtype)
        self.gate_proj = Linear(dim, context_dim, False, **kw)
        self.up_proj = Linear(dim, context_dim, False, **kw)
        self.down_proj = Linear(context_dim, dim, False, **kw)
        self.act = get_activation(hidden_act)

    def __call__(self, params, x):
        h = self.proj(params["proj"], x)
        h = jax.nn.gelu(self.post_projection_norm(params["post_projection_norm"], h),
                        approximate=False)
        return self.down_proj(params["down_proj"],
                              self.act(self.gate_proj(params["gate_proj"], h))
                              * self.up_proj(params["up_proj"], h))


class Glm4vVisionModel(Module):
    def __init__(self, config: Glm4vVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.patch_embed = Glm4vVisionPatchEmbed(config, **kw)
        self.post_conv_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        side = config.image_size // config.patch_size
        self.pos_side = side
        embeddings = Module(dtype=dtype, param_dtype=param_dtype)
        embeddings.position_embedding = Embedding(
            side * side, config.hidden_size, embedding_init=normal_init(0.02), **kw)
        self.embeddings = embeddings
        self.blocks = [Glm4vVisionBlock(config, **kw) for _ in range(config.depth)]
        self.post_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.merger = Glm4vVisionPatchMerger(config.out_hidden_size,
                                             config.intermediate_size,
                                             config.hidden_act, **kw)
        self.merge = config.spatial_merge_size
        head_dim = config.hidden_size // config.num_heads
        self.rot_dim = head_dim // 2
        self.inv_freq = 1.0 / (10000.0 ** (np.arange(0, self.rot_dim, 2, dtype=np.float64) / self.rot_dim))

    def init(self, rng):
        params = super().init(rng)
        c = self.config
        k = jax.random.split(rng, 2)[1]
        params["downsample"] = {
            "weight": normal_init(0.02)(k, (c.out_hidden_size, c.hidden_size,
                                            self.merge, self.merge), self.param_dtype),
            "bias": jnp.zeros((c.out_hidden_size,), self.param_dtype)}
        return params

    def _coords(self, grid_thw):
        """(h, w) per patch in merge-block order (reference rot_pos_emb)."""
        m = self.merge
        coords = []
        for t, h, w in grid_thw:
            hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
            hpos = hpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
            wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
            wpos = wpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
            coords.append(np.tile(np.stack([hpos, wpos], -1), (t, 1)))
        return np.concatenate(coords, axis=0)

    def _pos_embed(self, params, coords, grid_thw):
        """Bicubic border grid_sample of the learned grid (reference :145)."""
        lengths = [int(t * h * w) for t, h, w in grid_thw]
        target_h = np.concatenate([np.full(n, g[1], np.float64)
                                   for n, g in zip(lengths, grid_thw)])
        target_w = np.concatenate([np.full(n, g[2], np.float64)
                                   for n, g in zip(lengths, grid_thw)])
        norm_w = ((coords[:, 1] + 0.5) / target_w) * 2 - 1
        norm_h = ((coords[:, 0] + 0.5) / target_h) * 2 - 1
        idx, wgt = bicubic_border_sample_plan(self.pos_side, norm_w, norm_h)
        table = params["embeddings"]["position_embedding"]["weight"].astype(jnp.float32)
        taps = jnp.take(table, jnp.asarray(idx.reshape(-1)), axis=0).reshape(*idx.shape, -1)
        return (taps * jnp.asarray(wgt, jnp.float32)[:, :, None]).sum(1)

    def __call__(self, params, pixel_values, grid_thw: np.ndarray):
        hidden = self.patch_embed(params["patch_embed"], pixel_values)
        hidden = self.post_conv_layernorm(params["post_conv_layernorm"], hidden)

        coords = self._coords(grid_thw)
        max_grid = int(np.max(grid_thw[:, 1:]))
        table = np.outer(np.arange(max_grid, dtype=np.float64), self.inv_freq)
        angles = table[coords].reshape(coords.shape[0], -1)
        emb = np.concatenate([angles, angles], axis=-1)
        cos = jnp.asarray(np.cos(emb), jnp.float32)
        sin = jnp.asarray(np.sin(emb), jnp.float32)

        hidden = hidden + self._pos_embed(params, coords, grid_thw).astype(hidden.dtype)

        lengths = [int(t * h * w) for t, h, w in grid_thw]
        outs = []
        start = 0
        for n in lengths:
            h_img = hidden[start:start + n]
            cos_i, sin_i = cos[start:start + n], sin[start:start + n]
            for i, block in enumerate(self.blocks):
                h_img = block(params["blocks"][str(i)], h_img, cos_i, sin_i)
            outs.append(h_img)
            start += n
        hidden = jnp.concatenate(outs, axis=0)
        hidden = self.post_layernorm(params["post_layernorm"], hidden)

        # strided Conv2d downsample over each merge block (reference :699)
        m = self.merge
        c = hidden.shape[-1]
        blocks = hidden.reshape(-1, m, m, c).transpose(0, 3, 1, 2).reshape(-1, c * m * m)
        w = params["downsample"]["weight"].astype(self.dtype).reshape(-1, c * m * m)
        hidden = blocks.astype(self.dtype) @ w.T + params["downsample"]["bias"].astype(self.dtype)
        return self.merger(params["merger"], hidden)


# ----------------------------------------------------------------------- text
class Glm4vTextAttention(GlmAttention):
    """q/k/v bias=True, o_proj bias-free (reference :516)."""

    def build_projections(self, config, qkv_bias, o_bias, kw):
        super(GlmAttention, self).build_projections(config, True, False, kw)


class Glm4vTextDecoderLayer(Glm4DecoderLayer):
    attention_cls = Glm4vTextAttention


class Glm4vTextModel(LlamaModel):
    """GLM-4 sandwich skeleton + chunked-section M-RoPE in the GLM
    interleaved convention (reference apply_multimodal_rotary_pos_emb)."""

    decoder_layer_cls = Glm4vTextDecoderLayer

    def compute_rope(self, position_ids):
        if position_ids.ndim == 2:
            position_ids = jnp.broadcast_to(position_ids[None], (3, *position_ids.shape))
        inv = jnp.asarray(self.inv_freq, jnp.float32)
        freqs = position_ids[..., None].astype(jnp.float32) * inv  # [3, B, S, L]
        section = self.config.mrope_section
        parts = jnp.split(freqs, np.cumsum(section)[:-1], axis=-1)
        mixed = jnp.concatenate([p[i % 3] for i, p in enumerate(parts)], axis=-1)
        emb = jnp.repeat(mixed, 2, axis=-1)  # interleaved layout
        scale = self.attention_scaling
        return (jnp.cos(emb) * scale).astype(self.dtype), (jnp.sin(emb) * scale).astype(self.dtype)


def get_rope_index_glm4v(config, input_ids: np.ndarray,
                         image_grid_thw: Optional[np.ndarray] = None,
                         video_grid_thw: Optional[np.ndarray] = None,
                         attention_mask: Optional[np.ndarray] = None):
    """Host numpy port of Glm4vModel.get_rope_index (reference :907)."""
    merge = config.vision_config.spatial_merge_size
    image_token = config.image_token_id
    vstart, vend = config.video_start_token_id, config.video_end_token_id
    b, s = input_ids.shape
    if attention_mask is None:
        attention_mask = np.ones_like(input_ids)
    if image_grid_thw is None and video_grid_thw is None:
        pos = np.maximum(np.cumsum(attention_mask, axis=-1) - 1, 0)
        pos = np.where(attention_mask == 0, 1, pos)
        position_ids = np.broadcast_to(pos[None], (3, b, s)).copy()
        deltas = position_ids.max(axis=(0, 2)) + 1 - s
        return position_ids, deltas.reshape(b, 1)

    position_ids = np.ones((3, b, s), np.int64)
    deltas = []
    img_i, vid_i, vid_group = 0, 0, 0
    for row in range(b):
        ids = input_ids[row][attention_mask[row] == 1]
        kinds = []
        in_video = False
        for tok in ids.tolist():
            if tok == vstart:
                in_video = True
            elif tok == vend:
                in_video = False
            kinds.append("video" if (tok == image_token and in_video)
                         else ("image" if tok == image_token else "text"))
        groups = []
        st = 0
        for i in range(1, len(kinds) + 1):
            if i == len(kinds) or kinds[i] != kinds[st]:
                groups.append((kinds[st], st, i))
                st = i
        chunks = []
        frame_num = 1
        for kind, st, ed in groups:
            st_idx = chunks[-1].max() + 1 if chunks else 0
            if kind == "image":
                t, h, w = image_grid_thw[img_i]
                gt, gh, gw = int(t), int(h) // merge, int(w) // merge
                t_idx = np.repeat(np.arange(gt), gh * gw)
                h_idx = np.tile(np.repeat(np.arange(gh), gw), gt)
                w_idx = np.tile(np.arange(gw), gt * gh)
                chunks.append(np.stack([t_idx, h_idx, w_idx]) + st_idx)
                img_i += 1
                frame_num = 1
            elif kind == "video":
                h, w = video_grid_thw[vid_i][1], video_grid_thw[vid_i][2]
                gh, gw = int(h) // merge, int(w) // merge
                for t_val in range(frame_num):
                    t_idx = np.full(gh * gw, t_val)
                    h_idx = np.repeat(np.arange(gh), gw)
                    w_idx = np.tile(np.arange(gw), gh)
                    chunks.append(np.stack([t_idx, h_idx, w_idx]) + st_idx)
                vid_group += 1
                if vid_group >= int(video_grid_thw[vid_i][0]):
                    vid_i += 1
                    vid_group = 0
                frame_num += 1
            else:
                n = ed - st
                chunks.append(np.broadcast_to(np.arange(n)[None], (3, n)) + st_idx)
                frame_num = 1
        llm = np.concatenate(chunks, axis=1)
        position_ids[:, row, attention_mask[row] == 1] = llm
        deltas.append(int(llm.max()) + 1 - s)
    return position_ids, np.asarray(deltas).reshape(b, 1)


# ------------------------------------------------------------------ composite
class Glm4vModel(Module):
    def __init__(self, config: Glm4vConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.visual = Glm4vVisionModel(config.vision_config, **kw)
        self.language_model = Glm4vTextModel(config.text_config, **kw)

    def embed_with_images(self, params, input_ids, pixel_values, image_grid_thw,
                          pixel_values_videos=None, video_grid_thw=None):
        mask = (input_ids == self.config.image_token_id) | \
               (input_ids == self.config.video_token_id)
        embeds = self.language_model.embed_tokens(
            params["language_model"]["embed_tokens"], jnp.where(mask, 0, input_ids))
        feats_list = []
        if pixel_values is not None:
            feats_list.append(self.visual(params["visual"], pixel_values,
                                          np.asarray(image_grid_thw)))
        if pixel_values_videos is not None:
            feats_list.append(self.visual(params["visual"], pixel_values_videos,
                                          np.asarray(video_grid_thw)))
        if not feats_list:
            return embeds
        feats = jnp.concatenate(feats_list, axis=0)
        order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
        gathered = jnp.take(feats.astype(embeds.dtype),
                            jnp.clip(order, 0, feats.shape[0] - 1), axis=0).reshape(embeds.shape)
        return jnp.where(mask[..., None], gathered, embeds)


class Glm4vPreTrainedModel(PreTrainedModel):
    config_class = Glm4vConfig
    base_model_prefix = "model"


class Glm4vForConditionalGeneration(Glm4vPreTrainedModel, GenerationMixin):
    _prefill_input_names = ("pixel_values", "pixel_values_videos")
    _static_prefill_input_names = ("image_grid_thw", "video_grid_thw")
    model_cls = Glm4vModel

    def __init__(self, config: Glm4vConfig, *, dtype=jnp.float32, param_dtype=None):
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

    def _prepare_generation_positions(self, input_ids, attention_mask, **model_kwargs):
        grid = model_kwargs.get("image_grid_thw")
        vgrid = model_kwargs.get("video_grid_thw")
        pos, deltas = get_rope_index_glm4v(
            self.config, np.asarray(input_ids),
            None if grid is None else np.asarray(grid),
            None if vgrid is None else np.asarray(vgrid), np.asarray(attention_mask))
        s = input_ids.shape[1]
        rope_last = (deltas[:, 0] + s - 1).astype(np.int32)
        return jnp.asarray(pos, jnp.int32), jnp.asarray(rope_last)

    def __call__(self, params, input_ids=None, pixel_values=None, image_grid_thw=None,
                 pixel_values_videos=None, video_grid_thw=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.model.embed_with_images(
                params["model"], input_ids, pixel_values, image_grid_thw,
                pixel_values_videos, video_grid_thw)
        if position_ids is None and input_ids is not None and past_key_values is None:
            grid = None if image_grid_thw is None else np.asarray(image_grid_thw)
            vgrid = None if video_grid_thw is None else np.asarray(video_grid_thw)
            mask = None if attention_mask is None else np.asarray(attention_mask)
            pos, _ = get_rope_index_glm4v(self.config, np.asarray(input_ids), grid, vgrid, mask)
            position_ids = jnp.asarray(pos)
        outputs = self.model.language_model(
            params["model"]["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)
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
