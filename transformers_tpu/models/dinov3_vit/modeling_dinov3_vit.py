"""DINOv3 ViT (reference models/dinov3_vit/modeling_dinov3_vit.py): plain ViT
with CLS + register tokens and 2-D axial RoPE over patch-center coordinates
(prefix tokens un-rotated), LayerScale residual gains, optional gated MLP."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, LayerNorm, Linear, Module, ModuleList, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..luke.modeling_luke import _Container
from .configuration_dinov3_vit import DINOv3ViTConfig


def _rope_tables(config, h, w):
    """cos/sin [num_patches, head_dim] from patch-center coords in [-1, 1]."""
    head_dim = config.hidden_size // config.num_attention_heads
    inv_freq = 1.0 / config.rope_theta ** np.arange(0, 1, 4 / head_dim,
                                                    dtype=np.float32)
    ch = (np.arange(0.5, h, dtype=np.float32) / h) * 2.0 - 1.0
    cw = (np.arange(0.5, w, dtype=np.float32) / w) * 2.0 - 1.0
    coords = np.stack(np.meshgrid(ch, cw, indexing="ij"), axis=-1).reshape(-1, 2)
    angles = 2 * math.pi * coords[:, :, None] * inv_freq[None, None, :]
    angles = angles.reshape(angles.shape[0], -1)
    angles = np.tile(angles, 2)
    return jnp.asarray(np.cos(angles)), jnp.asarray(np.sin(angles))


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


class DINOv3ViTEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_embeddings = Conv(config.num_channels, config.hidden_size,
                                     config.patch_size, stride=config.patch_size,
                                     ndim=2, dtype=dtype, param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        c = self.config
        params["cls_token"] = jnp.zeros((1, 1, c.hidden_size), self.param_dtype)
        params["mask_token"] = jnp.zeros((1, 1, c.hidden_size), self.param_dtype)
        params["register_tokens"] = jnp.zeros(
            (1, c.num_register_tokens, c.hidden_size), self.param_dtype)
        return params

    def __call__(self, params, pixel_values, bool_masked_pos=None):
        h = self.patch_embeddings(params["patch_embeddings"], pixel_values)
        b, c = h.shape[:2]
        h = h.reshape(b, c, -1).transpose(0, 2, 1)
        if bool_masked_pos is not None:
            mask = jnp.asarray(bool_masked_pos)[..., None]
            h = jnp.where(mask, params["mask_token"].astype(h.dtype), h)
        cls = jnp.broadcast_to(params["cls_token"].astype(h.dtype),
                               (b, 1, h.shape[-1]))
        reg = jnp.broadcast_to(params["register_tokens"].astype(h.dtype),
                               (b, self.config.num_register_tokens, h.shape[-1]))
        return jnp.concatenate([cls, reg, h], axis=1)


class DINOv3ViTAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        d = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = d // config.num_attention_heads
        self.q_proj = Linear(d, d, config.query_bias, **kw)
        self.k_proj = Linear(d, d, config.key_bias, **kw)
        self.v_proj = Linear(d, d, config.value_bias, **kw)
        self.o_proj = Linear(d, d, config.proj_bias, **kw)

    def __call__(self, params, hidden, cos, sin):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        n_patches = cos.shape[0]
        n_prefix = s - n_patches
        cs = cos[None, :, None, :].astype(q.dtype)
        sn = sin[None, :, None, :].astype(q.dtype)

        def rope(x):
            prefix, patches = x[:, :n_prefix], x[:, n_prefix:]
            patches = patches * cs + _rotate_half(patches) * sn
            return jnp.concatenate([prefix, patches], axis=1)

        q, k = rope(q), rope(k)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (self.head_dim ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)
        return self.o_proj(params["o_proj"], out)


class _LayerScale(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dim = config.hidden_size
        self.value = config.layerscale_value

    def init(self, rng):
        return {"lambda1": jnp.full((self.dim,), self.value, self.param_dtype)}

    def __call__(self, params, x):
        return x * params["lambda1"].astype(x.dtype)


class DINOv3ViTLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        d = config.hidden_size
        inter = config.intermediate_size
        self.norm1 = LayerNorm(d, config.layer_norm_eps, **kw)
        self.attention = DINOv3ViTAttention(config, **kw)
        self.layer_scale1 = _LayerScale(config, **kw)
        self.norm2 = LayerNorm(d, config.layer_norm_eps, **kw)
        self.use_gated = config.use_gated_mlp
        if config.use_gated_mlp:
            self.mlp = _Container({
                "gate_proj": Linear(d, inter, config.mlp_bias, **lkw),
                "up_proj": Linear(d, inter, config.mlp_bias, **lkw),
                "down_proj": Linear(inter, d, config.mlp_bias, **lkw)}, **kw)
        else:
            self.mlp = _Container({
                "up_proj": Linear(d, inter, config.mlp_bias, **lkw),
                "down_proj": Linear(inter, d, config.mlp_bias, **lkw)}, **kw)
        self.layer_scale2 = _LayerScale(config, **kw)
        self.act = get_activation(config.hidden_act)

    def _mlp(self, params, x):
        mods = self.mlp._children
        if self.use_gated:
            g = self.act(mods["gate_proj"](params["gate_proj"], x))
            u = mods["up_proj"](params["up_proj"], x)
            return mods["down_proj"](params["down_proj"], g * u)
        return mods["down_proj"](params["down_proj"],
                                 self.act(mods["up_proj"](params["up_proj"], x)))

    def __call__(self, params, hidden, cos, sin):
        h = self.attention(params["attention"],
                           self.norm1(params["norm1"], hidden), cos, sin)
        hidden = hidden + self.layer_scale1(params["layer_scale1"], h)
        h = self._mlp(params["mlp"], self.norm2(params["norm2"], hidden))
        return hidden + self.layer_scale2(params["layer_scale2"], h)


class DINOv3ViTEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [DINOv3ViTLayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, cos, sin):
        all_hidden = [hidden]
        for i, layer in enumerate(self.layer):
            hidden = layer(params["layer"][str(i)], hidden, cos, sin)
            all_hidden.append(hidden)
        return hidden, tuple(all_hidden)


class DINOv3ViTPreTrainedModel(PreTrainedModel):
    config_class = DINOv3ViTConfig
    base_model_prefix = "model"
    main_input_name = "pixel_values"
    _keys_to_ignore_on_load_unexpected = (r"rope_embeddings\.inv_freq",)


class DINOv3ViTModel(DINOv3ViTPreTrainedModel):
    def __init__(self, config: DINOv3ViTConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = DINOv3ViTEmbeddings(config, **kw)
        # hub checkpoints use a flat ``layer.{i}`` tree (no encoder wrapper)
        self.layer = [DINOv3ViTLayer(config, **kw)
                      for _ in range(config.num_hidden_layers)]
        self.norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values=None, bool_masked_pos=None,
                 **kwargs) -> BaseModelOutputWithPooling:
        px = jnp.asarray(pixel_values, self.dtype)
        hidden = self.embeddings(params["embeddings"], px, bool_masked_pos)
        cos, sin = _rope_tables(self.config,
                                px.shape[2] // self.config.patch_size,
                                px.shape[3] // self.config.patch_size)
        all_hidden = [hidden]
        for i, layer in enumerate(self.layer):
            hidden = layer(params["layer"][str(i)], hidden, cos, sin)
            all_hidden.append(hidden)
        hidden = self.norm(params["norm"], hidden)
        return BaseModelOutputWithPooling(last_hidden_state=hidden,
                                          pooler_output=hidden[:, 0],
                                          hidden_states=tuple(all_hidden))


@dataclass
class DINOv3ViTBackboneOutput(ModelOutput):
    feature_maps: Optional[tuple] = None
    last_hidden_state: Optional[jnp.ndarray] = None
    hidden_states: Optional[tuple] = None


class DINOv3ViTBackbone(DINOv3ViTPreTrainedModel):
    def __init__(self, config: DINOv3ViTConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = DINOv3ViTEmbeddings(config, **kw)
        self.model = DINOv3ViTEncoder(config, **kw)
        self.norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.stage_names = ["stem"] + [f"stage{i}" for i in
                                       range(1, config.num_hidden_layers + 1)]
        self.out_features = (getattr(config, "out_features", None)
                             or [self.stage_names[-1]])

    def __call__(self, params, pixel_values=None, **kwargs) -> DINOv3ViTBackboneOutput:
        px = jnp.asarray(pixel_values, self.dtype)
        hidden = self.embeddings(params["embeddings"], px)
        ph = px.shape[2] // self.config.patch_size
        pw = px.shape[3] // self.config.patch_size
        cos, sin = _rope_tables(self.config, ph, pw)
        _, all_hidden = self.model(params["model"], hidden, cos, sin)
        n_prefix = 1 + self.config.num_register_tokens
        reshape = getattr(self.config, "reshape_hidden_states", True)
        apply_ln = getattr(self.config, "apply_layernorm", True)
        feature_maps = []
        sequence_output = None
        last = len(self.stage_names) - 1
        for idx, (name, hs) in enumerate(zip(self.stage_names, all_hidden)):
            if idx == last:
                hs = self.norm(params["norm"], hs)
                sequence_output = hs
            elif apply_ln:
                hs = self.norm(params["norm"], hs)
            if name in self.out_features:
                patches = hs[:, n_prefix:]
                if reshape:
                    b = patches.shape[0]
                    patches = patches.reshape(b, ph, pw, -1).transpose(0, 3, 1, 2)
                feature_maps.append(patches)
        return DINOv3ViTBackboneOutput(feature_maps=tuple(feature_maps),
                                       last_hidden_state=sequence_output,
                                       hidden_states=all_hidden)
