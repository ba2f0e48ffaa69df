"""Qwen2.5-VL, TPU-native.

Semantics match reference src/transformers/models/qwen2_5_vl/modeling_qwen2_5_vl.py:
the text stack is Qwen2-VL's (M-RoPE); the vision tower differs — RMSNorm
blocks (:65), SwiGLU vision MLP with biases (:85), and WINDOW ATTENTION: the
spatial-merge units are permuted into windows (vision_utils.py:130
``get_vision_window_index``), every block attends within its window except
``fullatt_block_indexes`` which attend per-image, and the merger output is
un-permuted with argsort (:480-483).

TPU-native choice: instead of the reference's varlen flash path
(cu_seqlens), segment attention runs as ONE masked attention over all
patches with a block-diagonal segment-id mask — no host loop per window,
one device program per block. The window permutation itself is host numpy
(grid shapes are static per compiled call)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, Linear, Module, RMSNorm, normal_init
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from ...ops.masks import to_additive
from ...ops.rope import rotate_half
from ..qwen2_vl.modeling_qwen2_vl import (
    Qwen2VLForConditionalGeneration,
    Qwen2VLModel,
    Qwen2VLTextModel,
)
from .configuration_qwen2_5_vl import Qwen2_5_VLConfig


def get_window_index(grid_thw: np.ndarray, spatial_merge_size: int, window_size: int,
                     patch_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Window permutation over spatial-merge units (reference
    vision_utils.py:130): merge units tile into windows of
    window_size // spatial_merge_size // patch_size units; returns the
    permutation and per-window segment ids over PATCHES."""
    vit_window = window_size // spatial_merge_size // patch_size
    unit = spatial_merge_size**2
    index_chunks = []
    seg_ids = []
    base = 0
    seg = 0
    for t, h, w in grid_thw.tolist():
        t, h, w = int(t), int(h), int(w)
        lh, lw = h // spatial_merge_size, w // spatial_merge_size
        index = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % vit_window
        pad_w = (-lw) % vit_window
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        padded[:, :lh, :lw] = index
        nwh, nww = (lh + pad_h) // vit_window, (lw + pad_w) // vit_window
        padded = padded.reshape(t, nwh, vit_window, nww, vit_window)
        padded = padded.transpose(0, 1, 3, 2, 4).reshape(t * nwh * nww, vit_window * vit_window)
        for row in padded:
            valid = row[row != -100]
            if len(valid):
                index_chunks.append(valid + base)
                seg_ids.append(np.full(len(valid) * unit, seg, np.int32))
                seg += 1
        base += t * lh * lw
    window_index = np.concatenate(index_chunks)
    return window_index, np.concatenate(seg_ids)


def _segment_attention_bias(seg_ids: np.ndarray) -> jnp.ndarray:
    mask = seg_ids[None, :] == seg_ids[:, None]
    return to_additive(jnp.asarray(mask)[None, None], jnp.float32)[0, 0]


class Qwen2_5_VisionPatchEmbed(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        k = (config.temporal_patch_size, config.patch_size, config.patch_size)
        self.proj = Conv(config.in_channels, config.hidden_size, k, stride=k,
                         use_bias=False, ndim=3, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, patches):  # [N, C*T*P*P]
        c = self.config
        x = patches.reshape(-1, c.in_channels, c.temporal_patch_size, c.patch_size, c.patch_size)
        return self.proj(params["proj"], x.astype(self.dtype)).reshape(x.shape[0], -1)


class Qwen2_5_VLVisionAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_heads
        self.head_dim = config.hidden_size // config.num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.qkv = Linear(config.hidden_size, config.hidden_size * 3, True, **kw)
        self.proj = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def __call__(self, params, hidden, cos, sin, bias):  # hidden [N, E]
        n, e = hidden.shape
        qkv = self.qkv(params["qkv"], hidden).reshape(n, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        cos_ = cos[:, None, :]
        sin_ = sin[:, None, :]
        q = (q.astype(jnp.float32) * cos_ + rotate_half(q.astype(jnp.float32)) * sin_).astype(self.dtype)
        k = (k.astype(jnp.float32) * cos_ + rotate_half(k.astype(jnp.float32)) * sin_).astype(self.dtype)
        out = eager_attention(q[None], k[None], v[None].astype(self.dtype),
                              bias[None, None], is_causal=False, scale=self.head_dim**-0.5)[0]
        return self.proj(params["proj"], out.reshape(n, e))


class Qwen2_5_VLVisionMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.gate_proj = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.up_proj = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.down_proj = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.down_proj(params["down_proj"],
                              self.act(self.gate_proj(params["gate_proj"], x))
                              * self.up_proj(params["up_proj"], x))


class Qwen2_5_VLVisionBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm1 = RMSNorm(config.hidden_size, 1e-6, **kw)
        self.attn = Qwen2_5_VLVisionAttention(config, **kw)
        self.norm2 = RMSNorm(config.hidden_size, 1e-6, **kw)
        self.mlp = Qwen2_5_VLVisionMLP(config, **kw)

    def __call__(self, params, hidden, cos, sin, bias):
        hidden = hidden + self.attn(params["attn"], self.norm1(params["norm1"], hidden), cos, sin, bias)
        return hidden + self.mlp(params["mlp"], self.norm2(params["norm2"], hidden))


class Qwen2_5_VLPatchMerger(Module):
    """RMS ln_q + 2-layer MLP over merged units (reference :137; the mlp is a
    Sequential, so param names are mlp.0 / mlp.2)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        merged = config.hidden_size * (config.spatial_merge_size**2)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.ln_q = RMSNorm(config.hidden_size, 1e-6, dtype=dtype, param_dtype=param_dtype)
        self.merged_dim = merged
        mlp_container = Module(dtype=dtype, param_dtype=param_dtype)
        mlp_container._children["0"] = Linear(merged, merged, True, **kw)
        mlp_container._children["2"] = Linear(merged, config.out_hidden_size, True, **kw)
        self.mlp = mlp_container

    def __call__(self, params, x):  # [N, E]
        import jax

        h = self.ln_q(params["ln_q"], x).reshape(-1, self.merged_dim)
        h = self.mlp._children["0"](params["mlp"]["0"], h)
        h = jax.nn.gelu(h, approximate=False)
        return self.mlp._children["2"](params["mlp"]["2"], h)


class Qwen2_5_VisionTransformer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.patch_embed = Qwen2_5_VisionPatchEmbed(config, **kw)
        self.blocks = [Qwen2_5_VLVisionBlock(config, **kw) for _ in range(config.depth)]
        self.merger = Qwen2_5_VLPatchMerger(config, **kw)
        head_dim = config.hidden_size // config.num_heads
        self.rot_dim = head_dim // 2
        self.inv_freq = 1.0 / (10000.0 ** (np.arange(0, self.rot_dim, 2, dtype=np.float64) / self.rot_dim))

    def rot_pos_emb(self, grid_thw: np.ndarray) -> np.ndarray:
        m = self.config.spatial_merge_size
        pos_ids = []
        for t, h, w in grid_thw:
            hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
            hpos = hpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
            wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
            wpos = wpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
            ids = np.stack([hpos, wpos], axis=-1)
            pos_ids.append(np.tile(ids, (int(t), 1)))
        pos_ids = np.concatenate(pos_ids, axis=0)
        max_grid = int(np.max(grid_thw[:, 1:]))
        table = np.outer(np.arange(max_grid, dtype=np.float64), self.inv_freq)
        return table[pos_ids].reshape(pos_ids.shape[0], -1)

    def __call__(self, params, pixel_values, grid_thw: np.ndarray):
        cfg = self.config
        unit = cfg.spatial_merge_size**2
        hidden = self.patch_embed(params["patch_embed"], pixel_values)
        n = hidden.shape[0]

        window_index, window_segs = get_window_index(
            grid_thw, cfg.spatial_merge_size, cfg.window_size, cfg.patch_size)
        # full-attention segment ids are per FRAME (reference
        # vision_utils.get_vision_cu_seqlens: h*w per frame, t segments/entry)
        frame_sizes = [int(h * w) for t, h, w in grid_thw for _ in range(int(t))]
        img_segs = np.concatenate([
            np.full(nsz, seg, np.int32) for seg, nsz in enumerate(frame_sizes)])

        angles = self.rot_pos_emb(grid_thw)
        emb = np.concatenate([angles, angles], axis=-1)
        # permute merge units into window order (host numpy for rope/segments)
        perm_patches = (window_index[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
        emb = emb[perm_patches]
        img_segs = img_segs[perm_patches]
        cos = jnp.asarray(np.cos(emb), jnp.float32)
        sin = jnp.asarray(np.sin(emb), jnp.float32)
        hidden = jnp.take(hidden, jnp.asarray(perm_patches), axis=0)

        full_bias = _segment_attention_bias(img_segs)
        window_bias = _segment_attention_bias(window_segs)
        for i, block in enumerate(self.blocks):
            bias = full_bias if i in cfg.fullatt_block_indexes else window_bias
            hidden = block(params["blocks"][str(i)], hidden, cos, sin, bias)

        merged = self.merger(params["merger"], hidden)  # [N/unit, out]
        reverse = np.argsort(window_index)
        return jnp.take(merged, jnp.asarray(reverse), axis=0)


class Qwen2_5_VLModel(Qwen2VLModel):
    def __init__(self, config, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.visual = Qwen2_5_VisionTransformer(config.vision_config, **kw)
        self.language_model = Qwen2VLTextModel(config.text_config, **kw)


class Qwen2_5_VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    config_class = Qwen2_5_VLConfig
    model_cls = Qwen2_5_VLModel
