"""Pixtral vision encoder, TPU-native (reference
src/transformers/models/pixtral/modeling_pixtral.py).

Variable-aspect ViT with 2D rope (height frequencies interleave the even
rope channels, width the odd: :48-87), RMSNorm pre/post blocks, gated MLP,
and BLOCK-DIAGONAL attention across the images concatenated into one
sequence (:422 generate_block_attention_mask).

TPU framing: images are uniform-size per call (static shapes); the block
mask is a rendered additive bias.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ...core.module import Linear, Module, RMSNorm, normal_init
from ...modeling_outputs import BaseModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ...ops.rope import apply_rotary_pos_emb
from .configuration_pixtral import PixtralVisionConfig


class PixtralAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.head_dim
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        e = config.hidden_size
        self.q_proj = Linear(e, self.num_heads * self.head_dim, False, **kw)
        self.k_proj = Linear(e, self.num_heads * self.head_dim, False, **kw)
        self.v_proj = Linear(e, self.num_heads * self.head_dim, False, **kw)
        self.o_proj = Linear(self.num_heads * self.head_dim, e, False, **kw)

    def __call__(self, params, hidden, cos, sin, bias):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        q, k = apply_rotary_pos_emb(q, k, cos, sin)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, bias, is_causal=False, scale=self.head_dim ** -0.5)
        return self.o_proj(params["o_proj"], out.reshape(b, s, -1))


class PixtralMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.gate_proj = Linear(config.hidden_size, config.intermediate_size, False, **kw)
        self.up_proj = Linear(config.hidden_size, config.intermediate_size, False, **kw)
        self.down_proj = Linear(config.intermediate_size, config.hidden_size, False, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.down_proj(params["down_proj"],
                              self.act(self.gate_proj(params["gate_proj"], x))
                              * self.up_proj(params["up_proj"], x))


class PixtralAttentionLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention_norm = RMSNorm(config.hidden_size, 1e-5, **kw)
        self.attention = PixtralAttention(config, **kw)
        self.ffn_norm = RMSNorm(config.hidden_size, 1e-5, **kw)
        self.feed_forward = PixtralMLP(config, **kw)

    def __call__(self, params, hidden, cos, sin, bias):
        h = self.attention(params["attention"],
                           self.attention_norm(params["attention_norm"], hidden),
                           cos, sin, bias)
        hidden = hidden + h
        h = self.feed_forward(params["feed_forward"],
                              self.ffn_norm(params["ffn_norm"], hidden))
        return hidden + h


class _PixtralLayers(Module):
    def __init__(self, layers, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = layers
        self._children.pop("layers", None)
        for i, m in enumerate(layers):
            self._children[str(i)] = m


class PixtralTransformer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layers = _PixtralLayers(
            [PixtralAttentionLayer(config, **kw) for _ in range(config.num_hidden_layers)], **kw)

    def __call__(self, params, hidden, cos, sin, bias, output_hidden_states=False):
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["layers"][str(i)], hidden, cos, sin, bias)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class PixtralVisionModel(PreTrainedModel):
    config_class = PixtralVisionConfig
    base_model_prefix = "vision_encoder"
    main_input_name = "pixel_values"

    def __init__(self, config: PixtralVisionConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.ln_pre = RMSNorm(config.hidden_size, 1e-5, **kw)
        self.transformer = PixtralTransformer(config, **kw)
        # 2D rope tables: even rope channels carry height, odd carry width
        d = config.head_dim
        mpps = config.image_size // config.patch_size
        freqs = 1.0 / (config.rope_theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
        h = np.arange(mpps)[:, None]
        w = np.arange(mpps)[:, None]
        freqs_h = h * freqs[None, 0::2]
        freqs_w = w * freqs[None, 1::2]
        inv = np.concatenate([
            np.repeat(freqs_h[:, None, :], mpps, axis=1),
            np.repeat(freqs_w[None, :, :], mpps, axis=0),
        ], axis=-1).reshape(-1, d // 2)
        self.rope_table = np.concatenate([inv, inv], axis=-1)  # [mpps^2, d]
        self.mpps = mpps

    def init(self, rng):
        import jax

        params = super().init(rng)
        c = self.config
        k1, _ = jax.random.split(rng)
        params["patch_conv"] = {
            "weight": normal_init(c.initializer_range)(
                k1, (c.hidden_size, c.num_channels, c.patch_size, c.patch_size),
                self.param_dtype)}
        return params

    def __call__(self, params, pixel_values, image_sizes=None,
                 output_hidden_states=False, **kwargs):
        n, ch, hh, ww = pixel_values.shape
        p = self.config.patch_size
        gh, gw = hh // p, ww // p
        g = gh * gw
        x = pixel_values.reshape(n, ch, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n, g, ch * p * p)
        w = params["patch_conv"]["weight"].astype(self.dtype)
        patches = jnp.dot(x.astype(self.dtype), w.reshape(w.shape[0], -1).T)
        hidden = patches.reshape(1, n * g, -1)
        hidden = self.ln_pre(params["ln_pre"], hidden)

        # per-image meshgrid position ids (uniform sizes)
        pos = (np.arange(gh)[:, None] * self.mpps + np.arange(gw)[None, :]).reshape(-1)
        pos_ids = np.tile(pos, n)
        angles = jnp.asarray(self.rope_table[pos_ids], jnp.float32)[None]  # [1, S, D]
        cos = jnp.cos(angles).astype(self.dtype)
        sin = jnp.sin(angles).astype(self.dtype)

        # block-diagonal bias across images
        s = n * g
        blk = np.arange(s) // g
        bias = np.where(blk[:, None] == blk[None, :], 0.0,
                        float(np.finfo(np.float32).min))
        bias = jnp.asarray(bias, jnp.float32)[None, None]

        hidden, all_hidden = self.transformer(params["transformer"], hidden,
                                              cos, sin, bias, output_hidden_states)
        return BaseModelOutput(
            last_hidden_state=hidden,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)
