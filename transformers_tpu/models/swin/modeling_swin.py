"""Swin Transformer, TPU-native.

Semantics match reference src/transformers/models/swin/modeling_swin.py:
patch-conv stem + LayerNorm (:247-287), hierarchical stages whose blocks run
window attention with learned relative position bias (:329-398) alternating
unshifted / cyclically-shifted windows (:508-627 — shift mask built from the
9 shift regions, -100 additive fill), patch merging between stages
(:289-326, interleaved 2x2 gather -> LN -> 4C->2C reduction), final LN +
mean pooling.

TPU-first notes: every spatial dimension here is STATIC at trace time
(grid/window math is Python ints), so window partitioning lowers to pure
reshapes/transposes, the shift mask and relative-position index are
precomputed numpy constants, and the per-window attention is one batched
[B*nW, ws*ws] matmul pair on the MXU. Window/shift clamping when a stage's
resolution <= window_size matches reference ``set_shift_and_window_size``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.loading import WeightRule
from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, ImageClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from .configuration_swin import SwinConfig


def relative_position_index(ws: int) -> np.ndarray:
    """Flat (ws*ws, ws*ws) lookup into the (2ws-1)^2 bias table (reference
    SwinRelativePositionBias._create_relative_position_index :348-365)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def shift_attn_mask(height: int, width: int, ws: int, shift: int) -> np.ndarray:
    """[nW, ws*ws, ws*ws] additive mask (-100 across shift regions) for
    SW-MSA (reference SwinLayer.get_attn_mask :583-607)."""
    h_idx = np.arange(height)
    w_idx = np.arange(width)
    h_region = (h_idx >= height - ws).astype(np.int64) + (h_idx >= height - shift).astype(np.int64)
    w_region = (w_idx >= width - ws).astype(np.int64) + (w_idx >= width - shift).astype(np.int64)
    img = h_region[:, None] * 3 + w_region[None, :]
    img = img.reshape(height // ws, ws, width // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = img[:, None, :] - img[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, ws*ws, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """[B*nW, ws*ws, C] -> [B, H, W, C]."""
    c = x.shape[-1]
    x = x.reshape(-1, h // ws, w // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w, c)


class SwinPatchEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.projection = Conv(config.num_channels, config.embed_dim, config.patch_size,
                               stride=config.patch_size, padding=0, use_bias=True, ndim=2,
                               dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values):
        x = self.projection(params["projection"], pixel_values)  # [B, C, gh, gw]
        b, c, gh, gw = x.shape
        return x.reshape(b, c, gh * gw).transpose(0, 2, 1), (gh, gw)


class SwinEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.patch_embeddings = SwinPatchEmbeddings(config, **kw)
        self.norm = LayerNorm(config.embed_dim, 1e-5, **kw)
        g = config.image_size // config.patch_size
        self.num_patches = g * g

    def init(self, rng):
        params = super().init(rng)
        if self.config.use_absolute_embeddings:
            params["position_embeddings"] = jnp.zeros(
                (1, self.num_patches, self.config.embed_dim), self.param_dtype)
        return params

    def __call__(self, params, pixel_values):
        x, dims = self.patch_embeddings(params["patch_embeddings"], pixel_values)
        x = self.norm(params["norm"], x)
        if self.config.use_absolute_embeddings:
            x = x + params["position_embeddings"].astype(x.dtype)
        return x, dims


class SwinRelativePositionBias(Module):
    def __init__(self, num_heads, ws, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = num_heads
        self.ws = ws
        self.index = relative_position_index(ws).reshape(-1)

    def init(self, rng):
        return {"relative_position_bias_table": jnp.zeros(
            ((2 * self.ws - 1) ** 2, self.num_heads), self.param_dtype)}

    def __call__(self, params):
        table = params["relative_position_bias_table"].astype(jnp.float32)
        n = self.ws * self.ws
        bias = jnp.take(table, jnp.asarray(self.index), axis=0).reshape(n, n, self.num_heads)
        return bias.transpose(2, 0, 1)[None]  # [1, H, N, N]


class SwinAttention(Module):
    def __init__(self, config, dim, num_heads, ws, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.q_proj = Linear(dim, dim, config.qkv_bias, **kw)
        self.k_proj = Linear(dim, dim, config.qkv_bias, **kw)
        self.v_proj = Linear(dim, dim, config.qkv_bias, **kw)
        self.o_proj = Linear(dim, dim, True, **kw)
        self.relative_position_bias = SwinRelativePositionBias(
            num_heads, ws, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, windows, attn_bias):
        """windows: [BW, N, C]; attn_bias: [BW, H, N, N] float32 additive."""
        bw, n, c = windows.shape
        q = self.q_proj(params["q_proj"], windows).reshape(bw, n, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], windows).reshape(bw, n, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], windows).reshape(bw, n, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * self.scale
        scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(bw, n, c)
        return self.o_proj(params["o_proj"], out)


class SwinMLP(Module):
    def __init__(self, config, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        inner = int(config.mlp_ratio * dim)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.fc1 = Linear(dim, inner, True, **kw)
        self.fc2 = Linear(inner, dim, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class SwinLayer(Module):
    def __init__(self, config, dim, input_resolution, num_heads, shift_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.window_size = config.window_size
        self.shift_size = shift_size
        # reference set_shift_and_window_size: clamp when the resolution is
        # not larger than the window
        if min(input_resolution) <= self.window_size:
            self.shift_size = 0
            self.window_size = min(input_resolution)
        self.input_resolution = input_resolution
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layernorm_before = LayerNorm(dim, config.layer_norm_eps, **kw)
        self.attention = SwinAttention(config, dim, num_heads, self.window_size, **kw)
        self.layernorm_after = LayerNorm(dim, config.layer_norm_eps, **kw)
        self.mlp = SwinMLP(config, dim, **kw)

    def __call__(self, params, hidden):
        height, width = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        b, _, c = hidden.shape
        shortcut = hidden
        h = self.layernorm_before(params["layernorm_before"], hidden)
        h = h.reshape(b, height, width, c)

        pad_r = (ws - width % ws) % ws
        pad_b = (ws - height % ws) % ws
        if pad_r or pad_b:
            h = jnp.pad(h, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = height + pad_b, width + pad_r

        if shift > 0:
            h = jnp.roll(h, shift=(-shift, -shift), axis=(1, 2))
        windows = window_partition(h, ws)  # [B*nW, ws*ws, C]

        n = ws * ws
        nw = (hp // ws) * (wp // ws)
        bias = self.attention.relative_position_bias(
            params["attention"]["relative_position_bias"])  # [1, H, N, N]
        if shift > 0:
            mask = jnp.asarray(shift_attn_mask(hp, wp, ws, shift))  # [nW, N, N]
            bias = bias[:, None] + mask[None, :, None]              # [1, nW, H, N, N]
        else:
            bias = bias[:, None]                                    # [1, 1, H, N, N]
        bias = jnp.broadcast_to(bias, (b, nw, self.attention.num_heads, n, n))
        bias = bias.reshape(b * nw, self.attention.num_heads, n, n)

        attn = self.attention(params["attention"], windows, bias)
        attn = window_reverse(attn, ws, hp, wp)
        if shift > 0:
            attn = jnp.roll(attn, shift=(shift, shift), axis=(1, 2))
        if pad_r or pad_b:
            attn = attn[:, :height, :width]
        hidden = shortcut + attn.reshape(b, height * width, c)

        h = self.layernorm_after(params["layernorm_after"], hidden)
        return hidden + self.mlp(params["mlp"], h)


class SwinPatchMerging(Module):
    def __init__(self, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.reduction = Linear(4 * dim, 2 * dim, False, **kw)
        self.norm = LayerNorm(4 * dim, 1e-5, **kw)

    def __call__(self, params, x, dims):
        height, width = dims
        b, _, c = x.shape
        x = x.reshape(b, height, width, c)
        if height % 2 or width % 2:
            x = jnp.pad(x, ((0, 0), (0, height % 2), (0, width % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, row::2, col::2, :] for col in range(2) for row in range(2)], axis=-1)
        x = x.reshape(b, -1, 4 * c)
        return self.reduction(params["reduction"], self.norm(params["norm"], x))


class SwinStage(Module):
    def __init__(self, config, dim, input_resolution, depth, num_heads, has_downsample,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.blocks = [
            SwinLayer(config, dim, input_resolution, num_heads,
                      shift_size=0 if i % 2 == 0 else config.window_size // 2, **kw)
            for i in range(depth)
        ]
        self.input_resolution = input_resolution
        self.downsample = SwinPatchMerging(dim, **kw) if has_downsample else None

    def __call__(self, params, hidden):
        for i, block in enumerate(self.blocks):
            hidden = block(params["blocks"][str(i)], hidden)
        before = hidden
        if self.downsample is not None:
            hidden = self.downsample(params["downsample"], hidden, self.input_resolution)
        return hidden, before


class SwinEncoder(Module):
    def __init__(self, config, grid, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        n = len(config.depths)
        self.layers = [
            SwinStage(config, int(config.embed_dim * 2**i),
                      (grid[0] // (2**i), grid[1] // (2**i)),
                      config.depths[i], config.num_heads[i], i < n - 1, **kw)
            for i in range(n)
        ]

    def __call__(self, params, hidden, output_hidden_states=False):
        all_hidden = [hidden] if output_hidden_states else None
        for i, stage in enumerate(self.layers):
            hidden, _ = stage(params["layers"][str(i)], hidden)
            if output_hidden_states:
                all_hidden.append(hidden)
        return hidden, all_hidden


# legacy (pre-v5) checkpoint layout -> v5 module names
SWIN_WEIGHT_RULES = (
    WeightRule(pattern=r"(.*)\.attention\.self\.query\.(.*)", rename=r"\1.attention.q_proj.\2",
               save_pattern=r"(.*)\.attention\.q_proj\.(.*)", save_rename=r"\1.attention.self.query.\2"),
    WeightRule(pattern=r"(.*)\.attention\.self\.key\.(.*)", rename=r"\1.attention.k_proj.\2",
               save_pattern=r"(.*)\.attention\.k_proj\.(.*)", save_rename=r"\1.attention.self.key.\2"),
    WeightRule(pattern=r"(.*)\.attention\.self\.value\.(.*)", rename=r"\1.attention.v_proj.\2",
               save_pattern=r"(.*)\.attention\.v_proj\.(.*)", save_rename=r"\1.attention.self.value.\2"),
    WeightRule(pattern=r"(.*)\.attention\.self\.relative_position_bias_table$",
               rename=r"\1.attention.relative_position_bias.relative_position_bias_table",
               save_pattern=r"(.*)\.attention\.relative_position_bias\.relative_position_bias_table$",
               save_rename=r"\1.attention.self.relative_position_bias_table"),
    WeightRule(pattern=r"(.*)\.attention\.output\.dense\.(.*)", rename=r"\1.attention.o_proj.\2",
               save_pattern=r"(.*)\.attention\.o_proj\.(.*)", save_rename=r"\1.attention.output.dense.\2"),
    WeightRule(pattern=r"(.*)\.intermediate\.dense\.(.*)", rename=r"\1.mlp.fc1.\2",
               save_pattern=r"(.*blocks\.\d+)\.mlp\.fc1\.(.*)", save_rename=r"\1.intermediate.dense.\2"),
    WeightRule(pattern=r"(.*blocks\.\d+)\.output\.dense\.(.*)", rename=r"\1.mlp.fc2.\2",
               save_pattern=r"(.*blocks\.\d+)\.mlp\.fc2\.(.*)", save_rename=r"\1.output.dense.\2"),
)


class SwinModel(Module):
    # DonutSwin omits the final layernorm (reference modeling_donut_swin.py:801)
    use_final_layernorm = True

    def __init__(self, config: SwinConfig, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = SwinEmbeddings(config, **kw)
        g = config.image_size // config.patch_size
        self.encoder = SwinEncoder(config, (g, g), **kw)
        num_features = int(config.embed_dim * 2 ** (len(config.depths) - 1))
        if self.use_final_layernorm:
            self.layernorm = LayerNorm(num_features, config.layer_norm_eps, **kw)
        self.add_pooling_layer = add_pooling_layer

    def __call__(self, params, pixel_values, output_hidden_states=False) -> BaseModelOutputWithPooling:
        hidden, dims = self.embeddings(params["embeddings"], pixel_values)
        hidden, all_hidden = self.encoder(params["encoder"], hidden, output_hidden_states)
        if self.use_final_layernorm:
            hidden = self.layernorm(params["layernorm"], hidden)
        pooled = jnp.mean(hidden, axis=1) if self.add_pooling_layer else None
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class SwinPreTrainedModel(PreTrainedModel):
    config_class = SwinConfig
    base_model_prefix = "swin"
    main_input_name = "pixel_values"
    _weight_rules = SWIN_WEIGHT_RULES
    _keys_to_ignore_on_load_unexpected = (r"relative_position_index",)


class SwinModelStandalone(SwinPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.swin = SwinModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.swin(params["swin"], pixel_values, **kwargs)


class SwinForImageClassification(SwinPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.num_labels = config.num_labels
        self.swin = SwinModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_size, config.num_labels, True, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values, labels=None, output_hidden_states=False,
                 **kwargs) -> ImageClassifierOutput:
        outputs = self.swin(params["swin"], pixel_values, output_hidden_states)
        logits = self.classifier(params["classifier"], outputs.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ImageClassifierOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)
