"""SigLIP2 (NaFlex), TPU-native (reference src/transformers/models/siglip2/modular_siglip2.py).

Differences from SigLIP:
- vision input is PRE-PATCHIFIED: pixel_values [B, L, C*P*P] with
  ``spatial_shapes`` [B, 2] and a ``pixel_attention_mask`` [B, L];
- patch embedding is a Linear; positional embeddings are bilinearly
  resized PER IMAGE to (h_i, w_i) and padded to L;
- encoder + attention-pool head consume the padding mask.

TPU framing: the per-image positional resize has a traced target size, so
it is expressed as two triangle-filter weight matrices (the exact
F.interpolate(bilinear, align_corners=False, antialias=True) kernel:
support = max(in/out, 1)) contracted against the [H, W, E] table —
static shapes, no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling
from ...modeling_utils import PreTrainedModel
from ...ops.attention import get_attention_fn
from ..clip.modeling_clip import CLIPEncoder, CLIPMLP
from ..siglip.modeling_siglip import SiglipOutput, SiglipTextTransformer
from .configuration_siglip2 import Siglip2Config, Siglip2TextConfig, Siglip2VisionConfig


def _triangle_resize_weights(out_len: int, in_len: int, target):
    """[out_len, in_len] triangle-filter rows for a traced target size
    (torch F.interpolate bilinear/antialias semantics): rows >= target are
    don't-care (the caller never gathers them)."""
    target = jnp.maximum(target.astype(jnp.float32), 1.0)
    scale = in_len / target                       # traced scalar
    support = jnp.maximum(scale, 1.0)
    o = jnp.arange(out_len, dtype=jnp.float32)[:, None]
    i = jnp.arange(in_len, dtype=jnp.float32)[None, :]
    center = (o + 0.5) * scale
    w = jnp.maximum(0.0, 1.0 - jnp.abs(i + 0.5 - center) / support)
    return w / jnp.maximum(w.sum(-1, keepdims=True), 1e-12)


def resize_positional_embeddings(pos, spatial_shapes, max_length):
    """pos [H, W, E] -> [B, max_length, E] resized to each (h_i, w_i),
    row-major flattened, padded with the resized [0, 0] embedding
    (reference Siglip2VisionEmbeddings.resize_positional_embeddings)."""
    hh, ww, e = pos.shape
    pos32 = pos.astype(jnp.float32)

    def per_image(shape):
        h, w = shape[0], shape[1]
        wh = _triangle_resize_weights(max_length, hh, h)   # [L, H]
        wv = _triangle_resize_weights(max_length, ww, w)   # [L, W]
        j = jnp.arange(max_length, dtype=jnp.int32)
        wsafe = jnp.maximum(w, 1)
        r = jnp.where(j < h * w, j // wsafe, 0)
        c = jnp.where(j < h * w, j % wsafe, 0)
        wh_g = wh[r]                                       # [L, H]
        wv_g = wv[c]                                       # [L, W]
        return jnp.einsum("ja,jb,abe->je", wh_g, wv_g, pos32)

    return jax.vmap(per_image)(spatial_shapes.astype(jnp.int32)).astype(pos.dtype)


class Siglip2VisionEmbeddings(Module):
    def __init__(self, config: Siglip2VisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(0.02))
        self.patch_embedding = Linear(
            config.num_channels * config.patch_size ** 2, config.hidden_size, True, **kw)
        self.position_embedding = Embedding(
            config.num_patches, config.hidden_size, dtype=dtype, param_dtype=param_dtype,
            embedding_init=normal_init(0.02))
        self.grid = int(config.num_patches ** 0.5)

    def __call__(self, params, pixel_values, spatial_shapes):
        patches = self.patch_embedding(params["patch_embedding"],
                                       pixel_values.astype(self.dtype))
        table = params["position_embedding"]["weight"].astype(self.dtype)
        pos = table.reshape(self.grid, self.grid, -1)
        resized = resize_positional_embeddings(pos, spatial_shapes,
                                               pixel_values.shape[1])
        return patches + resized


class Siglip2MultiheadAttentionPoolingHead(Module):
    """Probe attention pooling with key-padding mask (reference
    Siglip2MultiheadAttentionPoolingHead)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.mlp = CLIPMLP(config, **kw)

    def init(self, rng):
        params = super().init(rng)
        e = self.config.hidden_size
        k1, k2, k3 = jax.random.split(rng, 3)
        params["probe"] = normal_init(0.02)(k1, (1, 1, e), self.param_dtype)
        params["attention"] = {
            "in_proj_weight": normal_init(0.02)(k2, (3 * e, e), self.param_dtype),
            "in_proj_bias": jnp.zeros((3 * e,), self.param_dtype),
            "out_proj": {
                "weight": normal_init(0.02)(k3, (e, e), self.param_dtype),
                "bias": jnp.zeros((e,), self.param_dtype),
            },
        }
        return params

    def __call__(self, params, hidden, attention_mask=None):
        b, s, e = hidden.shape
        attn = params["attention"]
        w = attn["in_proj_weight"].astype(self.dtype)
        bproj = attn["in_proj_bias"].astype(self.dtype)
        wq, wk, wv = w[:e], w[e:2 * e], w[2 * e:]
        bq, bk, bv = bproj[:e], bproj[e:2 * e], bproj[2 * e:]
        probe = jnp.broadcast_to(params["probe"].astype(self.dtype), (b, 1, e))
        q = (jnp.dot(probe, wq.T) + bq).reshape(b, 1, self.num_heads, self.head_dim)
        k = (jnp.dot(hidden, wk.T) + bk).reshape(b, s, self.num_heads, self.head_dim)
        v = (jnp.dot(hidden, wv.T) + bv).reshape(b, s, self.num_heads, self.head_dim)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.head_dim ** -0.5, is_causal=False,
                      kv_valid=attention_mask).reshape(b, 1, e)
        out = (jnp.dot(out, attn["out_proj"]["weight"].astype(self.dtype).T)
               + attn["out_proj"]["bias"].astype(self.dtype))
        residual = out
        out = self.layernorm(params["layernorm"], out)
        out = residual + self.mlp(params["mlp"], out)
        return out[:, 0]


class Siglip2VisionTransformer(Module):
    def __init__(self, config: Siglip2VisionConfig, *, dtype, param_dtype, use_head=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = Siglip2VisionEmbeddings(config, **kw)
        self.encoder = CLIPEncoder(config, **kw)
        self.post_layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.head = Siglip2MultiheadAttentionPoolingHead(config, **kw) if use_head else None

    def __call__(self, params, pixel_values, pixel_attention_mask=None,
                 spatial_shapes=None, output_hidden_states=False):
        hidden = self.embeddings(params["embeddings"], pixel_values, spatial_shapes)
        attn_args = {"is_causal": False}
        if pixel_attention_mask is not None:
            attn_args["kv_valid"] = pixel_attention_mask
        hidden, all_hidden = self.encoder(params["encoder"], hidden, attn_args,
                                          output_hidden_states)
        hidden = self.post_layernorm(params["post_layernorm"], hidden)
        pooled = None
        if self.head is not None and "head" in params:
            pooled = self.head(params["head"], hidden, pixel_attention_mask)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class Siglip2PreTrainedModel(PreTrainedModel):
    config_class = Siglip2Config
    base_model_prefix = ""


class Siglip2VisionModel(Siglip2PreTrainedModel):
    config_class = Siglip2VisionConfig
    main_input_name = "pixel_values"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.vision_model = Siglip2VisionTransformer(
            config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, pixel_attention_mask=None,
                 spatial_shapes=None, **kwargs):
        return self.vision_model(params["vision_model"], pixel_values,
                                 pixel_attention_mask, spatial_shapes)


class Siglip2TextModel(Siglip2PreTrainedModel):
    config_class = Siglip2TextConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.text_model = SiglipTextTransformer(
            config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, input_ids, attention_mask=None, **kwargs):
        return self.text_model(params["text_model"], input_ids, attention_mask)


class Siglip2Model(Siglip2PreTrainedModel):
    def __init__(self, config: Siglip2Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_model = SiglipTextTransformer(config.text_config, **kw)
        self.vision_model = Siglip2VisionTransformer(config.vision_config, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["logit_scale"] = jnp.full((1,), 2.3026, self.param_dtype)
        params["logit_bias"] = jnp.full((1,), -10.0, self.param_dtype)
        return params

    def get_text_features(self, params, input_ids, attention_mask=None):
        return self.text_model(params["text_model"], input_ids, attention_mask).pooler_output

    def get_image_features(self, params, pixel_values, pixel_attention_mask=None,
                           spatial_shapes=None):
        return self.vision_model(params["vision_model"], pixel_values,
                                 pixel_attention_mask, spatial_shapes).pooler_output

    def __call__(self, params, input_ids=None, pixel_values=None, attention_mask=None,
                 pixel_attention_mask=None, spatial_shapes=None, **kwargs):
        text_out = self.text_model(params["text_model"], input_ids, attention_mask)
        vision_out = self.vision_model(params["vision_model"], pixel_values,
                                       pixel_attention_mask, spatial_shapes)
        t = text_out.pooler_output
        v = vision_out.pooler_output
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        bias = params["logit_bias"].astype(jnp.float32)
        logits_per_text = jnp.dot(t, v.T) * scale + bias
        return SiglipOutput(
            logits_per_text=logits_per_text,
            logits_per_image=logits_per_text.T,
            text_embeds=t, image_embeds=v,
            text_model_output=text_out, vision_model_output=vision_out)
