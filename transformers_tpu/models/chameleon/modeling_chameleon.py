"""Chameleon — early-fusion token-based multimodal LM (reference
models/chameleon/modeling_chameleon.py).

Images are tokenized by a VQ-VAE (:654 conv encoder with GroupNorm·swish
resnet blocks and a vanilla attention mid-block, :516 nearest-codebook
quantizer); the resulting codebook ids are remapped to BPE ids (:751
ChameleonImageVocabularyMapping) and simply spliced into the text sequence.
The decoder is a llama skeleton whose q/k get per-head LayerNorm with stats
over head_dim only (:187), with an optional ``swin_norm`` layer variant
(norms after the sub-blocks, :445).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import LayerNorm, Linear, Module, RMSNorm, normal_init
from ...modeling_outputs import CausalLMOutputWithPast
from ..llama.modeling_llama import (LlamaAttention, LlamaDecoderLayer,
                                    LlamaForCausalLM, LlamaModel,
                                    LlamaModelStandalone)
from .configuration_chameleon import ChameleonConfig, ChameleonVQVAEConfig


class ChameleonPerHeadLayerNorm(Module):
    """LayerNorm with stats over head_dim only but per-head gamma/beta [H, D]
    (reference :187)."""

    def __init__(self, num_heads, head_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.shape = (num_heads, head_dim)

    def init(self, rng):
        return {"weight": jnp.ones(self.shape, self.param_dtype),
                "bias": jnp.zeros(self.shape, self.param_dtype)}

    def __call__(self, params, x):  # [B, S, H, D]
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        h = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        h = h.astype(self.dtype)
        return h * params["weight"].astype(self.dtype) + params["bias"].astype(self.dtype)


class ChameleonAttention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.q_norm = ChameleonPerHeadLayerNorm(self.num_heads, self.head_dim, **kw)
        self.k_norm = ChameleonPerHeadLayerNorm(self.num_kv_heads, self.head_dim, **kw)


class ChameleonDecoderLayer(LlamaDecoderLayer):
    attention_cls = ChameleonAttention


class ChameleonSwinDecoderLayer(LlamaDecoderLayer):
    """Norms AFTER the sub-blocks (reference :445)."""

    attention_cls = ChameleonAttention

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h, cache = self.self_attn(params["self_attn"], hidden, cos, sin, attn_args,
                                  cache, cache_position)
        h = self.input_layernorm(params["input_layernorm"], h)
        hidden = residual + h
        residual = hidden
        h = self.mlp(params["mlp"], hidden)
        h = self.post_attention_layernorm(params["post_attention_layernorm"], h)
        return residual + h, cache


# ------------------------------------------------------------------- VQ-VAE
def group_norm(x, weight, bias, groups=32, eps=1e-6):
    """GroupNorm over NCHW."""
    b, c, h, w = x.shape
    xf = x.astype(jnp.float32).reshape(b, groups, c // groups, h, w)
    mean = xf.mean(axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, c, h, w)
    return xf * weight[None, :, None, None] + bias[None, :, None, None]


def conv2d(x, w, b=None, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if b is not None:
        y = y + b.astype(jnp.float32)[None, :, None, None]
    return y


class _Conv(Module):
    def __init__(self, cin, cout, k, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.shape = (cout, cin, k, k)

    def init(self, rng):
        return {"weight": normal_init(0.02)(rng, self.shape, self.param_dtype),
                "bias": jnp.zeros((self.shape[0],), self.param_dtype)}


class _GN(Module):
    def __init__(self, c, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.c = c

    def init(self, rng):
        return {"weight": jnp.ones((self.c,), self.param_dtype),
                "bias": jnp.zeros((self.c,), self.param_dtype)}


class ChameleonVQVAEEncoderResnetBlock(Module):
    def __init__(self, config, cin, cout=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        cout = cin if cout is None else cout
        self.cin, self.cout = cin, cout
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm1 = _GN(cin, **kw)
        self.conv1 = _Conv(cin, cout, 3, **kw)
        self.norm2 = _GN(cout, **kw)
        self.conv2 = _Conv(cout, cout, 3, **kw)
        if cin != cout:
            self.nin_shortcut = _Conv(cin, cout, 1, **kw)

    def __call__(self, params, x):
        res = x
        h = group_norm(x, params["norm1"]["weight"].astype(jnp.float32),
                       params["norm1"]["bias"].astype(jnp.float32))
        h = h * jax.nn.sigmoid(h)
        h = conv2d(h, params["conv1"]["weight"], params["conv1"]["bias"])
        h = group_norm(h, params["norm2"]["weight"].astype(jnp.float32),
                       params["norm2"]["bias"].astype(jnp.float32))
        h = h * jax.nn.sigmoid(h)
        h = conv2d(h, params["conv2"]["weight"], params["conv2"]["bias"])
        if self.cin != self.cout:
            res = conv2d(res, params["nin_shortcut"]["weight"],
                         params["nin_shortcut"]["bias"], padding=0)
        return res + h


class ChameleonVQVAEEncoderAttnBlock(Module):
    def __init__(self, c, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm = _GN(c, **kw)
        self.q = _Conv(c, c, 1, **kw)
        self.k = _Conv(c, c, 1, **kw)
        self.v = _Conv(c, c, 1, **kw)
        self.proj_out = _Conv(c, c, 1, **kw)

    def __call__(self, params, x):
        res = x
        h = group_norm(x, params["norm"]["weight"].astype(jnp.float32),
                       params["norm"]["bias"].astype(jnp.float32))
        q = conv2d(h, params["q"]["weight"], params["q"]["bias"], padding=0)
        k = conv2d(h, params["k"]["weight"], params["k"]["bias"], padding=0)
        v = conv2d(h, params["v"]["weight"], params["v"]["bias"], padding=0)
        b, c, hh, ww = q.shape
        q = q.reshape(b, c, hh * ww).transpose(0, 2, 1)
        k = k.reshape(b, c, hh * ww)
        attn = jax.nn.softmax(jnp.einsum("bqc,bck->bqk", q, k) * (c ** -0.5), axis=-1)
        v = v.reshape(b, c, hh * ww)
        out = jnp.einsum("bck,bqk->bcq", v, attn).reshape(b, c, hh, ww)
        out = conv2d(out, params["proj_out"]["weight"], params["proj_out"]["bias"],
                     padding=0)
        return res + out


class ChameleonVQVAEEncoder(Module):
    """reference :654."""

    def __init__(self, config: ChameleonVQVAEConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        base = config.base_channels
        mults = (1,) + tuple(config.channel_multiplier)
        self.conv_in = _Conv(config.in_channels, base, 3, **kw)
        downs = []
        curr_res = config.resolution
        for i, mult in enumerate(config.channel_multiplier):
            level = Module(dtype=dtype, param_dtype=param_dtype)
            cin = base * mults[i]
            cout = base * mult
            blocks, attns = [], []
            for _ in range(config.num_res_blocks):
                blocks.append(ChameleonVQVAEEncoderResnetBlock(config, cin, cout, **kw))
                cin = cout
                if (config.attn_resolutions is not None
                        and curr_res in config.attn_resolutions
                        and config.attn_type == "vanilla"):
                    attns.append(ChameleonVQVAEEncoderAttnBlock(cin, **kw))
            level.block = blocks
            if attns:
                level.attn = attns
            else:
                level._has_attn = False
            if i != len(config.channel_multiplier) - 1:
                ds = Module(dtype=dtype, param_dtype=param_dtype)
                ds.conv = _Conv(cin, cin, 3, **kw)
                level.downsample = ds
                curr_res //= 2
            downs.append(level)
        self.down = downs
        block_in = base * config.channel_multiplier[-1]
        mid = Module(dtype=dtype, param_dtype=param_dtype)
        mid.block_1 = ChameleonVQVAEEncoderResnetBlock(config, block_in, block_in, **kw)
        if config.attn_type == "vanilla":
            mid.attn_1 = ChameleonVQVAEEncoderAttnBlock(block_in, **kw)
        mid.block_2 = ChameleonVQVAEEncoderResnetBlock(config, block_in, block_in, **kw)
        self.mid = mid
        self.norm_out = _GN(block_in, **kw)
        out_ch = 2 * config.latent_channels if config.double_latent else config.latent_channels
        self.conv_out = _Conv(block_in, out_ch, 3, **kw)
        self.attn_type = config.attn_type

    def __call__(self, params, pixel_values):
        h = conv2d(pixel_values, params["conv_in"]["weight"], params["conv_in"]["bias"])
        n_levels = len(self.down)
        for i, level in enumerate(self.down):
            lp = params["down"][str(i)]
            for j, block in enumerate(level.block):
                h = block(lp["block"][str(j)], h)
                if hasattr(level, "attn") and j < len(level.attn):
                    h = level.attn[j](lp["attn"][str(j)], h)
            if i != n_levels - 1:
                # pad (0,1,0,1) then stride-2 valid conv (reference :563)
                hp = jnp.pad(h, ((0, 0), (0, 0), (0, 1), (0, 1)))
                h = conv2d(hp, lp["downsample"]["conv"]["weight"],
                           lp["downsample"]["conv"]["bias"], stride=2, padding=0)
        h = self.mid.block_1(params["mid"]["block_1"], h)
        if self.attn_type == "vanilla":
            h = self.mid.attn_1(params["mid"]["attn_1"], h)
        h = self.mid.block_2(params["mid"]["block_2"], h)
        h = group_norm(h, params["norm_out"]["weight"].astype(jnp.float32),
                       params["norm_out"]["bias"].astype(jnp.float32))
        h = h * jax.nn.sigmoid(h)
        return conv2d(h, params["conv_out"]["weight"], params["conv_out"]["bias"])


class ChameleonVQVAE(Module):
    """Encoder + quant_conv + nearest-codebook quantizer (reference :516/:724)."""

    def __init__(self, config: ChameleonVQVAEConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.encoder = ChameleonVQVAEEncoder(config, **kw)
        self.quant_conv = _Conv(config.latent_channels, config.embed_dim, 1, **kw)
        # decoder-side projection: unused for tokenization but present in
        # checkpoints (reference ChameleonVQVAE :724)
        self.post_quant_conv = _Conv(config.embed_dim, config.latent_channels, 1, **kw)
        quantize = Module(dtype=dtype, param_dtype=param_dtype)
        from ...core.module import Embedding

        quantize.embedding = Embedding(config.num_embeddings, config.embed_dim,
                                       embedding_init=normal_init(0.02), **kw)
        self.quantize = quantize

    def encode(self, params, pixel_values):
        h = self.encoder(params["encoder"], pixel_values)
        h = conv2d(h, params["quant_conv"]["weight"], params["quant_conv"]["bias"],
                   padding=0)
        b, c, hh, ww = h.shape
        flat = h.transpose(0, 2, 3, 1).reshape(-1, c)
        table = params["quantize"]["embedding"]["weight"].astype(jnp.float32)
        d = (jnp.sum(flat**2, 1, keepdims=True) + jnp.sum(table**2, 1)
             - 2 * flat @ table.T)
        indices = jnp.argmin(d, axis=1)
        return indices.reshape(b, hh * ww)


class ChameleonModel(LlamaModel):
    decoder_layer_cls = ChameleonDecoderLayer

    def __init__(self, config: ChameleonConfig, *, dtype, param_dtype):
        if config.swin_norm:
            object.__setattr__(self, "decoder_layer_cls", ChameleonSwinDecoderLayer)
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.vqmodel = ChameleonVQVAE(config.vq_config, dtype=dtype,
                                      param_dtype=param_dtype)
        vmap = config.vocabulary_map or {}
        self.image_token_id = vmap.get("<image>")
        img_tokens = sorted(v for k, v in vmap.items() if k.startswith("IMGIMG"))
        chrmap = {chr(ord("A") + i): str(i) for i in range(10)}
        name = {v: k for k, v in vmap.items()}
        img2bpe = {}
        for tok in img_tokens:
            digits = "".join(chrmap.get(c, c) for c in name[tok][len("IMGIMG"):-1])
            img2bpe[int(digits)] = tok
        if img2bpe:
            table = np.zeros(max(img2bpe) + 1, np.int32)
            for k, v in img2bpe.items():
                table[k] = v
            self.img2bpe_table = table
        else:
            self.img2bpe_table = None

    def get_image_tokens(self, params, pixel_values):
        codes = self.vqmodel.encode(params["vqmodel"], pixel_values)  # [B, S]
        return jnp.take(jnp.asarray(self.img2bpe_table), codes, axis=0)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, position_ids=None, past_key_values=None,
                 cache_position=0, inputs_embeds=None, output_hidden_states=False,
                 **kwargs):
        if pixel_values is not None and input_ids is not None:
            image_tokens = self.get_image_tokens(params, pixel_values)
            mask = input_ids == self.image_token_id
            order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
            flat = image_tokens.reshape(-1)
            gathered = jnp.take(flat, jnp.clip(order, 0, flat.shape[0] - 1))
            input_ids = jnp.where(mask, gathered.reshape(input_ids.shape), input_ids)
        return super().__call__(params, input_ids, attention_mask, position_ids,
                                past_key_values, cache_position, inputs_embeds,
                                output_hidden_states)


class ChameleonForConditionalGeneration(LlamaForCausalLM):
    config_class = ChameleonConfig
    model_cls = ChameleonModel
    _prefill_input_names = ("pixel_values",)

    def __call__(self, params, input_ids=None, pixel_values=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        outputs = self.model(params["model"], input_ids, pixel_values, attention_mask,
                             position_ids, past_key_values, cache_position,
                             inputs_embeds, output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.compute_logits(params, hidden)
        # image BPE tokens are never generated as text (reference :1121)
        if self.model.img2bpe_table is not None:
            img_ids = jnp.asarray(np.asarray(self.model.img2bpe_table)[
                np.asarray(self.model.img2bpe_table) > 0])
            neg = jnp.finfo(logits.dtype).min
            logits = logits.at[:, :, img_ids].set(neg)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      past_key_values=outputs.past_key_values,
                                      hidden_states=outputs.hidden_states)


class ChameleonModelStandalone(LlamaModelStandalone):
    config_class = ChameleonConfig
    model_cls = ChameleonModel
