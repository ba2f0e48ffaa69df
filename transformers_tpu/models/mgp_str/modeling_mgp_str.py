"""MGP-STR (reference models/mgp_str/modeling_mgp_str.py): scene-text
recognition — a DeiT-style encoder over the text image, then three A^3 token
learners (grouped 1x1 convs producing per-character attention over patches)
feeding character / BPE / wordpiece heads."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Conv, LayerNorm, Linear, Module, ModuleList, normal_init
from ...modeling_outputs import BaseModelOutput, ModelOutput
from ...modeling_utils import PreTrainedModel
from ..luke.modeling_luke import _Container
from .configuration_mgp_str import MgpstrConfig


@dataclass
class MgpstrModelOutput(ModelOutput):
    logits: Optional[tuple] = None
    hidden_states: Optional[tuple] = None
    a3_attentions: Optional[tuple] = None


class MgpstrEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        ih, iw = config.image_size
        self.num_patches = (ih // config.patch_size) * (iw // config.patch_size)
        self.num_tokens = 2 if config.distilled else 1
        self.proj = Conv(config.num_channels, config.hidden_size,
                         config.patch_size, stride=config.patch_size, ndim=2,
                         dtype=dtype, param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        c = self.config
        params["cls_token"] = jnp.zeros((1, 1, c.hidden_size), self.param_dtype)
        params["pos_embed"] = jnp.zeros(
            (1, self.num_patches + self.num_tokens, c.hidden_size),
            self.param_dtype)
        return params

    def __call__(self, params, pixel_values):
        h = self.proj(params["proj"], pixel_values)
        b, c = h.shape[:2]
        h = h.reshape(b, c, -1).transpose(0, 2, 1)
        cls = jnp.broadcast_to(params["cls_token"].astype(h.dtype),
                               (b, 1, h.shape[-1]))
        h = jnp.concatenate([cls, h], axis=1)
        return h + params["pos_embed"].astype(h.dtype)


class MgpstrAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        d = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = d // config.num_attention_heads
        self.qkv = Linear(d, 3 * d, config.qkv_bias, **kw)
        self.proj = Linear(d, d, True, **kw)

    def __call__(self, params, hidden):
        b, s, d = hidden.shape
        qkv = self.qkv(params["qkv"], hidden)
        qkv = qkv.reshape(b, s, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (self.head_dim ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
        return self.proj(params["proj"], out)


class MgpstrLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        d = config.hidden_size
        inter = int(d * config.mlp_ratio)
        self.norm1 = LayerNorm(d, config.layer_norm_eps, **kw)
        self.attn = MgpstrAttention(config, **kw)
        self.norm2 = LayerNorm(d, config.layer_norm_eps, **kw)
        self.mlp = _Container({"fc1": Linear(d, inter, True, **lkw),
                               "fc2": Linear(inter, d, True, **lkw)}, **kw)

    def __call__(self, params, hidden):
        hidden = hidden + self.attn(params["attn"],
                                    self.norm1(params["norm1"], hidden))
        h = self.norm2(params["norm2"], hidden)
        mods = self.mlp._children
        h = mods["fc2"](params["mlp"]["fc2"],
                        jax.nn.gelu(mods["fc1"](params["mlp"]["fc1"], h),
                                    approximate=False))
        return hidden + h


class MgpstrEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.blocks = [MgpstrLayer(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden):
        all_hidden = [hidden]
        for i, blk in enumerate(self.blocks):
            hidden = blk(params["blocks"][str(i)], hidden)
            all_hidden.append(hidden)
        return hidden, tuple(all_hidden)


class MgpstrA3Module(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.token_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.tokenLearner = _Container({
            "0": Conv(d, d, 1, use_bias=False, groups=8, ndim=2, **kw),
            "1": Conv(d, config.max_token_length, 1, use_bias=False, ndim=2, **kw),
        }, **kw)
        self.feat = Conv(d, d, 1, use_bias=False, groups=8, ndim=2, **kw)
        self.norm = LayerNorm(d, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden):  # [B, S, D]
        h = self.token_norm(params["token_norm"], hidden)
        h = h.transpose(0, 2, 1)[..., None]  # [B, D, S, 1]
        mods = self.tokenLearner._children
        sel = mods["1"](params["tokenLearner"]["1"],
                        mods["0"](params["tokenLearner"]["0"], h))
        sel = sel.reshape(sel.shape[0], sel.shape[1], -1)
        attn = jax.nn.softmax(sel, axis=-1)  # [B, T, S]
        feat = self.feat(params["feat"], h)
        feat = feat.reshape(feat.shape[0], feat.shape[1], -1).transpose(0, 2, 1)
        out = jnp.einsum("bsi,bid->bsd", attn, feat)
        return self.norm(params["norm"], out), attn


class MgpstrPreTrainedModel(PreTrainedModel):
    config_class = MgpstrConfig
    base_model_prefix = "mgp_str"
    main_input_name = "pixel_values"


class MgpstrModel(MgpstrPreTrainedModel):
    def __init__(self, config: MgpstrConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = MgpstrEmbeddings(config, **kw)
        self.encoder = MgpstrEncoder(config, **kw)

    def __call__(self, params, pixel_values=None, **kwargs) -> BaseModelOutput:
        emb = self.embeddings(params["embeddings"],
                              jnp.asarray(pixel_values, self.dtype))
        hidden, all_hidden = self.encoder(params["encoder"], emb)
        return BaseModelOutput(last_hidden_state=hidden,
                               hidden_states=all_hidden)


class MgpstrForSceneTextRecognition(MgpstrPreTrainedModel):
    def __init__(self, config: MgpstrConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.mgp_str = MgpstrModel(config, **kw)
        self.char_a3_module = MgpstrA3Module(config, **kw)
        self.bpe_a3_module = MgpstrA3Module(config, **kw)
        self.wp_a3_module = MgpstrA3Module(config, **kw)
        self.char_head = Linear(config.hidden_size,
                                config.num_character_labels, True, **lkw)
        self.bpe_head = Linear(config.hidden_size, config.num_bpe_labels, True, **lkw)
        self.wp_head = Linear(config.hidden_size,
                              config.num_wordpiece_labels, True, **lkw)

    def __call__(self, params, pixel_values=None, **kwargs) -> MgpstrModelOutput:
        out = self.mgp_str(params["mgp_str"], pixel_values)
        hidden = out.last_hidden_state
        char_out, char_attn = self.char_a3_module(params["char_a3_module"], hidden)
        bpe_out, bpe_attn = self.bpe_a3_module(params["bpe_a3_module"], hidden)
        wp_out, wp_attn = self.wp_a3_module(params["wp_a3_module"], hidden)
        logits = (self.char_head(params["char_head"], char_out),
                  self.bpe_head(params["bpe_head"], bpe_out),
                  self.wp_head(params["wp_head"], wp_out))
        return MgpstrModelOutput(logits=logits,
                                 hidden_states=out.hidden_states,
                                 a3_attentions=(char_attn, bpe_attn, wp_attn))
