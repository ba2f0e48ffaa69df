"""Qwen2-VL, TPU-native (reference models/qwen2_vl/modeling_qwen2_vl.py:
M-RoPE :180/:797, dynamic-resolution ViT, PatchMerger).

- Vision: flattened-patch projection (conv-as-matmul), 2D rotary from (h, w)
  grid positions, per-image full attention (the reference's cu_seqlens become
  a host loop over images — each image is one static-shape program), 2x2
  PatchMerger.
- Text: Qwen2 skeleton whose rope mixes three position streams (temporal /
  height / width) by ``mrope_section`` ONCE per forward — every layer shares
  the mixed tables, so the standard rotate-half apply is unchanged.
- ``get_rope_index`` (host, numpy) builds the 3D position ids from token
  spans + image grids; generate threads them through the jitted decode via
  the GenerationMixin position hooks.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import StaticKVCache, cache_from_config
from ...core.loading import WeightRule
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from ...ops.rope import compute_cos_sin, rotate_half
from ..llama.modeling_llama import LlamaModel
from ..qwen2.modeling_qwen2 import Qwen2DecoderLayer
from .configuration_qwen2_vl import Qwen2VLConfig, Qwen2VLTextConfig, Qwen2VLVisionConfig


# --------------------------------------------------------------------- vision
class Qwen2VLPatchEmbed(Module):
    """Conv3d-as-matmul over flattened patches (reference PatchEmbed)."""

    def __init__(self, config: Qwen2VLVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config

    def init(self, rng):
        c = self.config
        shape = (c.embed_dim, c.in_channels, c.temporal_patch_size, c.patch_size, c.patch_size)
        return {"proj": {"weight": normal_init(c.initializer_range)(rng, shape, self.param_dtype)}}

    def __call__(self, params, patches):  # [N, C*T*P*P]
        w = params["proj"]["weight"].astype(self.dtype)
        return jnp.dot(patches.astype(self.dtype), w.reshape(w.shape[0], -1).T)


class Qwen2VLVisionAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_heads
        self.head_dim = config.embed_dim // config.num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.qkv = Linear(config.embed_dim, config.embed_dim * 3, True, **kw)
        self.proj = Linear(config.embed_dim, config.embed_dim, True, **kw)

    def __call__(self, params, hidden, cos, sin):  # hidden [N, E]
        n, e = hidden.shape
        qkv = self.qkv(params["qkv"], hidden).reshape(n, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # [N, H, D]
        # rotary in float32 (reference apply_rotary_pos_emb_vision)
        cos_ = cos[:, None, :]
        sin_ = sin[:, None, :]
        q = (q.astype(jnp.float32) * cos_ + rotate_half(q.astype(jnp.float32)) * sin_).astype(self.dtype)
        k = (k.astype(jnp.float32) * cos_ + rotate_half(k.astype(jnp.float32)) * sin_).astype(self.dtype)
        out = eager_attention(q[None], k[None], v[None].astype(self.dtype),
                              is_causal=False, scale=self.head_dim**-0.5)[0]
        return self.proj(params["proj"], out.reshape(n, e))


class Qwen2VLVisionMlp(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        hidden = int(config.embed_dim * config.mlp_ratio)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.fc1 = Linear(config.embed_dim, hidden, True, **kw)
        self.fc2 = Linear(hidden, config.embed_dim, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class Qwen2VLVisionBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm1 = LayerNorm(config.embed_dim, 1e-6, **kw)
        self.attn = Qwen2VLVisionAttention(config, **kw)
        self.norm2 = LayerNorm(config.embed_dim, 1e-6, **kw)
        self.mlp = Qwen2VLVisionMlp(config, **kw)

    def __call__(self, params, hidden, cos, sin):
        hidden = hidden + self.attn(params["attn"], self.norm1(params["norm1"], hidden), cos, sin)
        hidden = hidden + self.mlp(params["mlp"], self.norm2(params["norm2"], hidden))
        return hidden


class Qwen2VLPatchMerger(Module):
    """2x2 spatial merge + MLP (reference PatchMerger; mlp is a Sequential,
    so the param names are mlp.0 / mlp.2)."""

    def __init__(self, config: Qwen2VLVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        merged = config.embed_dim * (config.spatial_merge_size**2)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.ln_q = LayerNorm(config.embed_dim, 1e-6, dtype=dtype, param_dtype=param_dtype)
        self.merged_dim = merged
        mlp_container = Module(dtype=dtype, param_dtype=param_dtype)
        mlp_container._children["0"] = Linear(merged, merged, True, **kw)
        mlp_container._children["2"] = Linear(merged, config.hidden_size, True, **kw)
        self.mlp = mlp_container

    def __call__(self, params, x):
        h = self.ln_q(params["ln_q"], x).reshape(-1, self.merged_dim)
        h = self.mlp._children["0"](params["mlp"]["0"], h)
        h = jax.nn.gelu(h, approximate=False)
        return self.mlp._children["2"](params["mlp"]["2"], h)


class Qwen2VLVisionTransformer(Module):
    """reference Qwen2VisionTransformerPretrainedModel."""

    def __init__(self, config: Qwen2VLVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.patch_embed = Qwen2VLPatchEmbed(config, **kw)
        self.blocks = [Qwen2VLVisionBlock(config, **kw) for _ in range(config.depth)]
        self.merger = Qwen2VLPatchMerger(config, **kw)
        head_dim = config.embed_dim // config.num_heads
        self.rot_dim = head_dim // 2
        self.inv_freq = 1.0 / (10000.0 ** (np.arange(0, self.rot_dim, 2, dtype=np.float64) / self.rot_dim))

    def rot_pos_emb(self, grid_thw: np.ndarray) -> np.ndarray:
        """[n_patches, rot_dim] rotary angles from (h, w) grid positions
        (reference rot_pos_emb — merge-block ordering)."""
        m = self.config.spatial_merge_size
        pos_ids = []
        for t, h, w in grid_thw:
            hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
            hpos = hpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
            wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
            wpos = wpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
            ids = np.stack([hpos, wpos], axis=-1)
            pos_ids.append(np.tile(ids, (t, 1)))
        pos_ids = np.concatenate(pos_ids, axis=0)  # [N, 2]
        max_grid = int(np.max(grid_thw[:, 1:]))
        table = np.outer(np.arange(max_grid, dtype=np.float64), self.inv_freq)  # [G, rot/2]
        emb = table[pos_ids].reshape(pos_ids.shape[0], -1)  # [N, rot]
        return emb

    def __call__(self, params, pixel_values, grid_thw: np.ndarray):
        """pixel_values [N_total_patches, C*T*P*P]; grid_thw host np [n, 3].
        Per-image attention (cu_seqlens analog) via a host loop."""
        hidden = self.patch_embed(params["patch_embed"], pixel_values)
        angles = self.rot_pos_emb(grid_thw)
        emb = np.concatenate([angles, angles], axis=-1)
        cos = jnp.asarray(np.cos(emb), jnp.float32)
        sin = jnp.asarray(np.sin(emb), jnp.float32)

        # attention segments are per FRAME, not per image/video: the reference
        # builds cu_seqlens = repeat_interleave(h*w, t).cumsum (each temporal
        # slice attends only within itself)
        lengths = [int(h * w) for t, h, w in grid_thw for _ in range(int(t))]
        outs = []
        start = 0
        for n in lengths:
            h_img = hidden[start : start + n]
            cos_i, sin_i = cos[start : start + n], sin[start : start + n]
            for i, block in enumerate(self.blocks):
                h_img = block(params["blocks"][str(i)], h_img, cos_i, sin_i)
            outs.append(h_img)
            start += n
        hidden = jnp.concatenate(outs, axis=0)
        return self.merger(params["merger"], hidden)


# ----------------------------------------------------------------------- text
class Qwen2VLTextModel(LlamaModel):
    """Qwen2 skeleton + M-RoPE section mixing (reference
    apply_multimodal_rotary_pos_emb :180 — done once per forward here since
    the mixed tables are layer-invariant)."""

    decoder_layer_cls = Qwen2DecoderLayer

    def compute_rope(self, position_ids):
        # position_ids: [B, S] (decode / pure text) or [3, B, S] (mrope)
        if position_ids.ndim == 2:
            position_ids = jnp.broadcast_to(position_ids[None], (3, *position_ids.shape))
        cos, sin = compute_cos_sin(position_ids, self.inv_freq, self.attention_scaling,
                                   dtype=self.dtype)  # [3, B, S, D]
        section = self.config.mrope_section
        # reference splits by mrope_section * 2 — the cat(freqs, freqs) table
        # alternates t/h/w sections within EACH half ([t0 h1 w23 | t0 h1 w23])
        sizes = list(section) + list(section)
        cos_parts = jnp.split(cos, np.cumsum(sizes)[:-1], axis=-1)
        sin_parts = jnp.split(sin, np.cumsum(sizes)[:-1], axis=-1)
        cos = jnp.concatenate([p[i % 3] for i, p in enumerate(cos_parts)], axis=-1)
        sin = jnp.concatenate([p[i % 3] for i, p in enumerate(sin_parts)], axis=-1)
        return cos, sin


def get_rope_index(config, input_ids: np.ndarray, image_grid_thw: Optional[np.ndarray] = None,
                   video_grid_thw: Optional[np.ndarray] = None,
                   attention_mask: Optional[np.ndarray] = None,
                   second_per_grid_ts: Optional[np.ndarray] = None) -> tuple[np.ndarray, np.ndarray]:
    """3D (t, h, w) position ids from token spans + vision grids — host numpy
    (reference Qwen2VLModel.get_rope_index)."""
    merge = config.vision_config.spatial_merge_size
    image_token = config.image_token_id
    video_token = config.video_token_id
    vision_start = config.vision_start_token_id
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
    img_i, vid_i = 0, 0
    for row in range(b):
        ids = input_ids[row][attention_mask[row] == 1]
        tokens = ids.tolist()
        starts = np.where(ids == vision_start)[0]
        vision_kinds = ids[starts + 1] if len(starts) else np.asarray([], ids.dtype)
        n_img = int((vision_kinds == image_token).sum())
        n_vid = int((vision_kinds == video_token).sum())
        chunks = []
        st = 0
        for _ in range(n_img + n_vid):
            ed_img = tokens.index(image_token, st) if image_token in tokens[st:] else len(tokens) + 1
            ed_vid = tokens.index(video_token, st) if video_token in tokens[st:] else len(tokens) + 1
            if ed_img < ed_vid:
                t, h, w = image_grid_thw[img_i]
                img_i += 1
                ed = ed_img
                is_video = False
                t_scale = 1.0
            else:
                t, h, w = video_grid_thw[vid_i]
                # Qwen2.5-VL scales video temporal indices by
                # tokens_per_second * seconds-per-grid (reference v4
                # get_rope_index; absent on plain Qwen2-VL -> scale 1)
                tps = getattr(config.vision_config, "tokens_per_second", None)
                spg = (float(second_per_grid_ts[vid_i])
                       if second_per_grid_ts is not None else 1.0)
                t_scale = float(tps) * spg if tps else 1.0
                vid_i += 1
                ed = ed_vid
                is_video = True
            gt, gh, gw = int(t), int(h) // merge, int(w) // merge
            text_len = ed - st
            st_idx = chunks[-1].max() + 1 if chunks else 0
            chunks.append(np.broadcast_to(np.arange(text_len)[None], (3, text_len)) + st_idx)
            t_idx = np.repeat((np.arange(gt) * t_scale).astype(np.int64), gh * gw) \
                if is_video else np.repeat(np.arange(gt), gh * gw)
            h_idx = np.tile(np.repeat(np.arange(gh), gw), gt)
            w_idx = np.tile(np.arange(gw), gt * gh)
            chunks.append(np.stack([t_idx, h_idx, w_idx]) + text_len + st_idx)
            st = ed + gt * gh * gw
        if st < len(tokens):
            st_idx = chunks[-1].max() + 1 if chunks else 0
            n = len(tokens) - st
            chunks.append(np.broadcast_to(np.arange(n)[None], (3, n)) + st_idx)
        llm = np.concatenate(chunks, axis=1)
        position_ids[:, row, attention_mask[row] == 1] = llm
        deltas.append(int(llm.max()) + 1 - s)
    return position_ids, np.asarray(deltas).reshape(b, 1)


class Qwen2VLModel(Module):
    def __init__(self, config: Qwen2VLConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.visual = Qwen2VLVisionTransformer(config.vision_config, **kw)
        self.language_model = Qwen2VLTextModel(config.text_config, **kw)

    def embed_with_images(self, params, input_ids, pixel_values, image_grid_thw,
                          pixel_values_videos=None, video_grid_thw=None):
        """Scatter image AND video features (both ride the same vision tower,
        reference modeling_qwen2_vl.py get_video_features == get_image_features)
        into their placeholder positions."""
        img_tok = self.config.image_token_id
        vid_tok = getattr(self.config, "video_token_id", None)
        clean = jnp.where(input_ids == img_tok, 0, input_ids)
        if vid_tok is not None:
            clean = jnp.where(input_ids == vid_tok, 0, clean)
        embeds = self.language_model.embed_tokens(
            params["language_model"]["embed_tokens"], clean)
        for values, grid, token in ((pixel_values, image_grid_thw, img_tok),
                                    (pixel_values_videos, video_grid_thw, vid_tok)):
            if values is None or token is None:
                continue
            feats = self.visual(params["visual"], values, np.asarray(grid))
            mask = input_ids == token
            order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
            gathered = jnp.take(feats.astype(embeds.dtype),
                                jnp.clip(order, 0, feats.shape[0] - 1),
                                axis=0).reshape(embeds.shape)
            embeds = jnp.where(mask[..., None], gathered, embeds)
        return embeds


class Qwen2VLPreTrainedModel(PreTrainedModel):
    config_class = Qwen2VLConfig
    base_model_prefix = "model"


class Qwen2VLForConditionalGeneration(Qwen2VLPreTrainedModel, GenerationMixin):
    _prefill_input_names = ("pixel_values", "pixel_values_videos")
    # grid shapes drive host-side loops -> static (baked into the compiled fn)
    _static_prefill_input_names = ("image_grid_thw", "video_grid_thw")
    # Legacy (pre-v5) checkpoint layout -> composed layout (the reference's
    # _checkpoint_conversion_mapping for qwen2_vl)
    _weight_rules = (
        WeightRule(pattern=r"^model\.layers\.", rename="model.language_model.layers."),
        WeightRule(pattern=r"^model\.embed_tokens\.", rename="model.language_model.embed_tokens."),
        WeightRule(pattern=r"^model\.norm\.", rename="model.language_model.norm."),
        WeightRule(pattern=r"^visual\.", rename="model.visual."),
    )

    model_cls = Qwen2VLModel

    def __init__(self, config: Qwen2VLConfig, *, dtype=jnp.float32, param_dtype=None):
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

    # M-RoPE position hook for the jitted generate (GenerationMixin)
    def _prepare_generation_positions(self, input_ids, attention_mask, **model_kwargs):
        grid = model_kwargs.get("image_grid_thw")
        vgrid = model_kwargs.get("video_grid_thw")
        spg = model_kwargs.get("second_per_grid_ts")
        pos, deltas = get_rope_index(self.config, np.asarray(input_ids),
                                     None if grid is None else np.asarray(grid),
                                     None if vgrid is None else np.asarray(vgrid),
                                     np.asarray(attention_mask),
                                     None if spg is None else np.asarray(spg))
        s = input_ids.shape[1]
        rope_last = (deltas[:, 0] + s - 1).astype(np.int32)
        return jnp.asarray(pos, jnp.int32), jnp.asarray(rope_last)

    def __call__(self, params, input_ids=None, pixel_values=None, image_grid_thw=None,
                 pixel_values_videos=None, video_grid_thw=None,
                 attention_mask=None, position_ids=None, past_key_values=None,
                 cache_position=0, inputs_embeds=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.model.embed_with_images(
                params["model"], input_ids, pixel_values, image_grid_thw,
                pixel_values_videos, video_grid_thw)
        if position_ids is None and input_ids is not None and past_key_values is None:
            grid = None if image_grid_thw is None else np.asarray(image_grid_thw)
            vgrid = None if video_grid_thw is None else np.asarray(video_grid_thw)
            mask = None if attention_mask is None else np.asarray(attention_mask)
            spg = kwargs.get("second_per_grid_ts")
            spg = None if spg is None else np.asarray(spg)
            pos, _ = get_rope_index(self.config, np.asarray(input_ids), grid,
                                    vgrid, mask, spg)
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
