"""Pegasus-X, TPU-native (reference src/transformers/models/pegasus_x/modeling_pegasus_x.py).

Long-document Pegasus: the encoder runs *global + blocked-local* attention —
``num_global_tokens`` learned global states attend everywhere, and each
block-of-``block_size`` tokens attends to its own block plus the globals
(reference PegasusXGlobalLocalAttention, modeling_pegasus_x.py:271). Odd
layers stagger the block grid by half a block. All projections are bias-free;
positions are on-the-fly fairseq sinusoids; pre-norm layers; tied lm_head
with NO final_logits_bias.

TPU framing: the blocked-local score tensor [B, H, N, K, G+K] is a dense
einsum — XLA maps it straight onto the MXU, no gather/scatter. Sequence
padding to a block multiple happens at trace time (static shapes), so jit
caches one program per padded length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput
from ...ops.activations import get_activation
from ..bart.modeling_bart import (BartAttention, BartDecoder, BartDecoderLayer,
                                  BartForConditionalGeneration, BartModel,
                                  BartPreTrainedModel)
from ..speecht5.modeling_speecht5 import sinusoidal_table
from .configuration_pegasus_x import PegasusXConfig

_MASK_MIN = -3.4e38  # float32 finfo.min, matches reference mask fill


class PegasusXSinusoidalPositions(Module):
    """Param-free fairseq sinusoid lookup (reference
    PegasusXSinusoidalPositionalEmbedding, modeling_pegasus_x.py:94)."""

    def __init__(self, max_positions, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.table = sinusoidal_table(max_positions, dim)

    def init(self, rng):
        return {}

    def __call__(self, params, positions):
        return self.table[positions].astype(self.dtype)


class PegasusXGlobalLocalAttention(Module):
    """Reference modeling_pegasus_x.py:271. ``mask`` is the additive float
    vector over (padded) local tokens; globals are always visible."""

    def __init__(self, embed_dim, num_heads, block_size, config, *, dtype,
                 param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.init_std))
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.block_size = block_size
        self.scaling = self.head_dim ** -0.5
        self.q_proj = Linear(embed_dim, embed_dim, False, **kw)
        self.k_proj = Linear(embed_dim, embed_dim, False, **kw)
        self.v_proj = Linear(embed_dim, embed_dim, False, **kw)
        self.out_proj = Linear(embed_dim, embed_dim, False, **kw)

    def _heads(self, params, name, x, scale=False):
        b, s, _ = x.shape
        h = getattr(self, name)(params[name], x)
        if scale:
            h = h * self.scaling
        return h.reshape(b, s, self.num_heads, self.head_dim)

    def __call__(self, params, token_hidden, global_hidden, mask):
        b, s, d = token_hidden.shape
        g = global_hidden.shape[1]
        n = s // self.block_size
        k = self.block_size
        lq = self._heads(params, "q_proj", token_hidden, scale=True)
        lk = self._heads(params, "k_proj", token_hidden)
        lv = self._heads(params, "v_proj", token_hidden)
        gq = self._heads(params, "q_proj", global_hidden, scale=True)
        gk = self._heads(params, "k_proj", global_hidden)
        gv = self._heads(params, "v_proj", global_hidden)

        # ---- global tokens attend to [globals ; all locals] ----
        all_k = jnp.concatenate([gk, lk], axis=1)  # [b, g+s, h, hd]
        all_v = jnp.concatenate([gv, lv], axis=1)
        ext_mask = jnp.concatenate([jnp.zeros((b, g), mask.dtype), mask], axis=1)
        gw = jnp.einsum("bghf,bxhf->bhgx", gq, all_k) + ext_mask[:, None, None, :]
        gp = jax.nn.softmax(gw.astype(jnp.float32), axis=-1).astype(token_hidden.dtype)
        gout = jnp.einsum("bhgx,bxhf->bghf", gp, all_v).reshape(b, g, d)
        gout = self.out_proj(params["out_proj"], gout)

        # ---- local tokens attend to [globals ; own block] ----
        blq = lq.reshape(b, n, k, self.num_heads, self.head_dim)
        blk = lk.reshape(b, n, k, self.num_heads, self.head_dim)
        blv = lv.reshape(b, n, k, self.num_heads, self.head_dim)
        blk_mask = jnp.concatenate(
            [jnp.zeros((b, n, g), mask.dtype), mask.reshape(b, n, k)], axis=-1)
        l2g = jnp.einsum("bnkhf,bghf->bhnkg", blq, gk)
        l2l = jnp.einsum("bnkhf,bnxhf->bhnkx", blq, blk)
        w = jnp.concatenate([l2g, l2l], axis=-1) + blk_mask[:, None, :, None, :]
        p = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(token_hidden.dtype)
        out = (jnp.einsum("bhnkg,bghf->bhnkf", p[..., :g], gv)
               + jnp.einsum("bhnkx,bnxhf->bhnkf", p[..., g:], blv))
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, s, d)
        out = self.out_proj(params["out_proj"], out)
        return out, gout


class PegasusXEncoderLayer(Module):
    """Pre-norm; local and global streams share fc1/fc2/final_layer_norm
    (reference modeling_pegasus_x.py:502)."""

    def __init__(self, config: PegasusXConfig, stagger, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = PegasusXGlobalLocalAttention(
            d, config.encoder_attention_heads, config.block_size, config, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.global_self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.fc1 = Linear(d, config.encoder_ffn_dim, True, **kw)
        self.fc2 = Linear(config.encoder_ffn_dim, d, True, **kw)
        self.final_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.act = get_activation(config.activation_function)
        self.stagger = stagger
        self.block_size = config.block_size

    def _ffn(self, params, x):
        h = self.final_layer_norm(params["final_layer_norm"], x)
        return x + self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))

    def __call__(self, params, hidden, global_hidden, mask):
        residual, g_residual = hidden, global_hidden
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        gh = self.global_self_attn_layer_norm(
            params["global_self_attn_layer_norm"], global_hidden)
        if self.stagger:
            pad = self.block_size // 2
            h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (pad, pad)), constant_values=_MASK_MIN)
        h, gh = self.self_attn(params["self_attn"], h, gh, mask)
        if self.stagger:
            pad = self.block_size // 2
            h = h[:, pad:-pad]
        hidden = residual + h
        global_hidden = g_residual + gh
        return self._ffn(params, hidden), self._ffn(params, global_hidden)


class PegasusXEncoder(Module):
    """Reference PegasusXEncoder: sinusoid positions, learned global token
    embeddings, trace-time padding to a block multiple, final LayerNorm;
    global states are dropped from the output."""

    def __init__(self, config: PegasusXConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.embed_global = Embedding(config.num_global_tokens, d,
                                      embedding_init=normal_init(config.init_std), **kw)
        self.embed_positions = PegasusXSinusoidalPositions(
            config.max_position_embeddings, d, **kw)
        self.layers = [PegasusXEncoderLayer(
            config, stagger=(i % 2 == 1 and config.stagger_local_blocks), **kw)
            for i in range(config.encoder_layers)]
        self.layer_norm = LayerNorm(d, 1e-5, **kw)
        import math

        self.embed_scale = math.sqrt(d) if config.scale_embedding else 1.0

    def __call__(self, params, inputs_embeds, attention_mask=None):
        b, s, d = inputs_embeds.shape
        positions = jnp.arange(s, dtype=jnp.int32)[None, :]
        h = inputs_embeds * self.embed_scale + self.embed_positions({}, positions)
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        mask = (1.0 - attention_mask.astype(jnp.float32)) * _MASK_MIN
        bs = self.config.block_size
        if s % bs != 0:
            pad_len = bs - s % bs
            h = jnp.pad(h, ((0, 0), (0, pad_len), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, pad_len)), constant_values=_MASK_MIN)
        g = self.embed_global(params["embed_global"],
                              jnp.arange(self.config.num_global_tokens))[None]
        g = jnp.broadcast_to(g, (b,) + g.shape[1:]).astype(h.dtype)
        for i, layer in enumerate(self.layers):
            h, g = layer(params["layers"][str(i)], h, g, mask)
        h = h[:, :s]
        return self.layer_norm(params["layer_norm"], h)


class PegasusXDecoderLayer(BartDecoderLayer):
    pre_norm = True

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        # PegasusX attention is bias-free (reference modeling_pegasus_x.py:624)
        self.self_attn = BartAttention(d, config.decoder_attention_heads,
                                       config, use_bias=False, **kw)
        self.encoder_attn = BartAttention(d, config.decoder_attention_heads,
                                          config, use_bias=False, **kw)


class PegasusXDecoder(BartDecoder):
    layer_cls = PegasusXDecoderLayer
    use_layernorm_embedding = False
    use_final_norm = True

    def make_positions(self, config, **kw):
        return PegasusXSinusoidalPositions(config.max_position_embeddings,
                                           config.d_model, **kw)


class PegasusXModel(BartModel):
    encoder_cls = PegasusXEncoder
    decoder_cls = PegasusXDecoder


class PegasusXPreTrainedModel(BartPreTrainedModel):
    config_class = PegasusXConfig


class PegasusXForConditionalGeneration(PegasusXPreTrainedModel,
                                       BartForConditionalGeneration):
    """Reference modeling_pegasus_x.py:1220: tied lm_head, no logits bias."""

    model_cls = PegasusXModel
    use_final_logits_bias = False
