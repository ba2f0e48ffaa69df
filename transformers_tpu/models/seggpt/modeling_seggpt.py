"""SegGPT (reference models/seggpt/modeling_seggpt.py): in-context image
segmentation — prompt image + prompt mask are stacked with the input image
along the batch axis of a plain-ViT encoder with decomposed rel-pos attention,
the two streams are averaged at `merge_index`, and a light conv decoder paints
the predicted mask from concatenated intermediate states."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, LayerNorm, Linear, Module, ModuleList, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..luke.modeling_luke import _Container
from .configuration_seggpt import SegGptConfig


@dataclass
class SegGptEncoderOutput(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    intermediate_hidden_states: Optional[tuple] = None


@dataclass
class SegGptImageSegmentationOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    pred_masks: Optional[jnp.ndarray] = None


def _cubic_kernel(t, a=-0.75):
    t = np.abs(t)
    out = np.where(t <= 1, (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1,
                   np.where(t < 2, a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a, 0.0))
    return out


def _bicubic_axis(in_size, out_size):
    """torch F.interpolate(bicubic, align_corners=False): 4 clamped taps/axis."""
    src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    idx = np.stack([np.clip(base + k, 0, in_size - 1) for k in (-1, 0, 1, 2)], 1)
    w = np.stack([_cubic_kernel(frac + 1), _cubic_kernel(frac),
                  _cubic_kernel(1 - frac), _cubic_kernel(2 - frac)], 1)
    return idx, w.astype(np.float32)


def _torch_bicubic(x, size):
    """x: [1, H, W, C] -> [1, size[0], size[1], C] with torch semantics."""
    h, w = x.shape[1], x.shape[2]
    xf = x.astype(jnp.float32)
    yidx, yw = _bicubic_axis(h, size[0])
    gathered = jnp.take(xf, jnp.asarray(yidx), axis=1)  # [B, out_h, 4, W, C]
    xf = jnp.einsum("ok,bokwc->bowc", jnp.asarray(yw), gathered)
    xidx, xw = _bicubic_axis(w, size[1])
    gathered = jnp.take(xf, jnp.asarray(xidx), axis=2)  # [B, H, out_w, 4, C]
    xf = jnp.einsum("ok,bhokc->bhoc", jnp.asarray(xw), gathered)
    return xf.astype(x.dtype)


class SegGptPatchEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.patch_size = config.patch_size
        self.grid = (config.image_size[0] // config.patch_size,
                     config.image_size[1] // config.patch_size)
        self.num_patches = self.grid[0] * self.grid[1]
        self.projection = Conv(config.num_channels, config.hidden_size,
                               config.patch_size, stride=config.patch_size,
                               ndim=2, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values):  # -> [B, H', W', C]
        h = self.projection(params["projection"], pixel_values)
        return h.transpose(0, 2, 3, 1)


class SegGptEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_embeddings = SegGptPatchEmbeddings(config, dtype=dtype,
                                                      param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        c = self.config
        for name in ("mask_token", "segment_token_input", "segment_token_prompt",
                     "type_token_semantic", "type_token_instance"):
            params[name] = jnp.zeros((1, 1, 1, c.hidden_size), self.param_dtype)
        n = (c.pretrain_image_size // c.patch_size) ** 2 + 1
        params["position_embeddings"] = jnp.zeros((1, n, c.hidden_size),
                                                  self.param_dtype)
        return params

    def _pos(self, params, h, w):
        pe = params["position_embeddings"].astype(jnp.float32)[:, 1:]
        size = int(round(pe.shape[1] ** 0.5))
        pe = pe.reshape(1, size, size, -1)
        if size != h or size != w:
            pe = _torch_bicubic(pe, (h, w))
        return pe

    def __call__(self, params, pixel_values, prompt_pixel_values,
                 bool_masked_pos, embedding_type="instance"):
        inp = self.patch_embeddings(params["patch_embeddings"], pixel_values)
        prm = self.patch_embeddings(params["patch_embeddings"], prompt_pixel_values)
        b, ph, pw, _ = inp.shape
        w = bool_masked_pos[..., None].astype(inp.dtype).reshape(-1, ph, pw, 1)
        prm = prm * (1 - w) + params["mask_token"].astype(inp.dtype) * w
        pos = self._pos(params, ph, pw).astype(inp.dtype)
        inp = inp + params["segment_token_input"].astype(inp.dtype) + pos
        prm = prm + params["segment_token_prompt"].astype(inp.dtype) + pos
        tok = params["type_token_semantic" if embedding_type == "semantic"
                     else "type_token_instance"].astype(inp.dtype)
        return jnp.concatenate([inp + tok, prm + tok], axis=0)


class SegGptAttention(Module):
    """Decomposed rel-pos attention over the full 2-D grid (reference
    SegGptAttention; same MViTv2 form as VitDet, non-windowed)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim ** -0.5
        self.use_rel_pos = config.use_relative_position_embeddings
        self.input_size = (config.image_size[0] // config.patch_size,
                           config.image_size[1] // config.patch_size)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.qkv = Linear(config.hidden_size, 3 * config.hidden_size,
                          config.qkv_bias, **kw)
        self.proj = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def init(self, rng):
        params = super().init(rng)
        if self.use_rel_pos:
            h, w = self.input_size
            params["rel_pos_h"] = jnp.zeros((2 * h - 1, self.head_dim), self.param_dtype)
            params["rel_pos_w"] = jnp.zeros((2 * w - 1, self.head_dim), self.param_dtype)
        return params

    @staticmethod
    def _rel_index(size):
        coords = np.arange(size)
        return (coords[:, None] - coords[None, :]) + size - 1

    def __call__(self, params, hidden):  # [B, H, W, C]
        b, h, w, c = hidden.shape
        qkv = self.qkv(params["qkv"], hidden.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * self.scale
        if self.use_rel_pos:
            rel_h = jnp.take(params["rel_pos_h"].astype(jnp.float32),
                             jnp.asarray(self._rel_index(h)), axis=0)
            rel_w = jnp.take(params["rel_pos_w"].astype(jnp.float32),
                             jnp.asarray(self._rel_index(w)), axis=0)
            qr = q.astype(jnp.float32).reshape(b, h, w, self.num_heads, self.head_dim)
            bias_h = jnp.einsum("bhwnd,hkd->bnhwk", qr, rel_h)
            bias_w = jnp.einsum("bhwnd,wkd->bnhwk", qr, rel_w)
            bias = bias_h[..., :, None] + bias_w[..., None, :]
            scores = scores + bias.reshape(b, self.num_heads, h * w, h * w)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, h, w, c)
        return self.proj(params["proj"], out)


class SegGptMlp(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.lin1 = Linear(config.hidden_size, config.mlp_dim, True, **kw)
        self.lin2 = Linear(config.mlp_dim, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, h):
        return self.lin2(params["lin2"], self.act(self.lin1(params["lin1"], h)))


class SegGptLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = SegGptAttention(config, **kw)
        self.mlp = SegGptMlp(config, **kw)
        self.layernorm_before = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.layernorm_after = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, ensemble_cond, feature_ensemble):
        attn = self.attention(params["attention"],
                              self.layernorm_before(params["layernorm_before"], hidden))
        if feature_ensemble and attn.shape[0] // 2 >= ensemble_cond:
            half = attn.shape[1] // 2
            prompt, inputs = attn[:, :half], attn[:, half:]
            if ensemble_cond == 2:
                num_prompts = attn.shape[0] // 2
                flat = inputs.reshape(2, num_prompts, -1)
                flat = jnp.broadcast_to(flat.mean(axis=1, keepdims=True), flat.shape)
                inputs = flat.reshape(prompt.shape)
            else:
                inputs = jnp.broadcast_to(inputs.mean(axis=0, keepdims=True),
                                          inputs.shape)
            attn = jnp.concatenate([prompt, inputs], axis=1)
        hidden = hidden + attn
        residual = hidden
        hidden = self.layernorm_after(params["layernorm_after"], hidden)
        return residual + self.mlp(params["mlp"], hidden)


class SegGptEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self._layers = [SegGptLayer(config, **kw)
                        for _ in range(config.num_hidden_layers)]
        self._children.pop("_layers", None)
        self.layers = ModuleList(self._layers)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, feature_ensemble=False):
        intermediates = []
        for i, layer in enumerate(self._layers):
            ensemble_cond = 2 if self.config.merge_index > i else 1
            hidden = layer(params["layers"][str(i)], hidden, ensemble_cond,
                           feature_ensemble)
            if i == self.config.merge_index:
                half = hidden.shape[0] // 2
                hidden = (hidden[:half] + hidden[half:]) * 0.5
            if i in self.config.intermediate_hidden_state_indices:
                intermediates.append(self.layernorm(params["layernorm"], hidden))
        return SegGptEncoderOutput(last_hidden_state=hidden,
                                   intermediate_hidden_states=tuple(intermediates))


class SegGptDecoderHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.decoder_hidden_size
        self.conv = Conv(d, d, 3, padding=1, ndim=2, **kw)
        self.layernorm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.head = Conv(d, 3, 1, ndim=2, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, h):  # [B, C, H, W]
        h = self.conv(params["conv"], h)
        h = h.transpose(0, 2, 3, 1)
        h = self.act(self.layernorm(params["layernorm"], h))
        return self.head(params["head"], h.transpose(0, 3, 1, 2))


class SegGptDecoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.patch_size = config.patch_size
        self.decoder_hidden_size = config.decoder_hidden_size
        self.decoder_embed = Linear(
            config.hidden_size * len(config.intermediate_hidden_state_indices),
            config.patch_size ** 2 * config.decoder_hidden_size, True,
            kernel_init=normal_init(0.02), **kw)
        self.decoder_pred = SegGptDecoderHead(config, **kw)

    def __call__(self, params, hidden):  # [B, H', W', C*k]
        h = self.decoder_embed(params["decoder_embed"], hidden)
        b, ph, pw, _ = h.shape
        p, d = self.patch_size, self.decoder_hidden_size
        h = h.reshape(b, ph, pw, p, p, d).transpose(0, 5, 1, 3, 2, 4)
        h = h.reshape(b, d, ph * p, pw * p)
        return self.decoder_pred(params["decoder_pred"], h)


def _patchify_mask(bool_masked_pos, patch_size, ph, pw):
    """Expand per-patch mask to a [B, 3, H, W] pixel mask (reference
    unpatchify of the repeated bool_masked_pos)."""
    b = bool_masked_pos.shape[0]
    m = bool_masked_pos.reshape(b, ph, pw).astype(jnp.float32)
    m = jnp.repeat(jnp.repeat(m, patch_size, axis=1), patch_size, axis=2)
    return jnp.broadcast_to(m[:, None], (b, 3, ph * patch_size, pw * patch_size))


class SegGptPreTrainedModel(PreTrainedModel):
    config_class = SegGptConfig
    base_model_prefix = "model"
    main_input_name = "pixel_values"


class SegGptModel(SegGptPreTrainedModel):
    def __init__(self, config: SegGptConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = SegGptEmbeddings(config, **kw)
        self.encoder = SegGptEncoder(config, **kw)

    def _default_mask(self, batch):
        n = self.embeddings.patch_embeddings.num_patches
        mask = jnp.concatenate([jnp.zeros((n // 2,), jnp.bool_),
                                jnp.ones((n - n // 2,), jnp.bool_)])
        return jnp.broadcast_to(mask[None], (batch, n))

    def __call__(self, params, pixel_values=None, prompt_pixel_values=None,
                 prompt_masks=None, bool_masked_pos=None, feature_ensemble=None,
                 embedding_type=None, labels=None, **kwargs) -> SegGptEncoderOutput:
        px = jnp.asarray(pixel_values, self.dtype)
        ppx = jnp.asarray(prompt_pixel_values, self.dtype)
        pm = jnp.asarray(prompt_masks, self.dtype)
        pixel = jnp.concatenate([ppx, px], axis=2)
        prompt = jnp.concatenate(
            [pm, pm if labels is None else jnp.asarray(labels, self.dtype)], axis=2)
        if bool_masked_pos is None:
            bool_masked_pos = self._default_mask(px.shape[0])
        emb = self.embeddings(params["embeddings"], pixel, prompt,
                              jnp.asarray(bool_masked_pos),
                              embedding_type or "instance")
        return self.encoder(params["encoder"], emb,
                            feature_ensemble=bool(feature_ensemble))


class SegGptForImageSegmentation(SegGptPreTrainedModel):
    def __init__(self, config: SegGptConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = SegGptModel(config, **kw)
        self.decoder = SegGptDecoder(config, **kw)

    def __call__(self, params, pixel_values=None, prompt_pixel_values=None,
                 prompt_masks=None, bool_masked_pos=None, feature_ensemble=None,
                 embedding_type=None, labels=None,
                 **kwargs) -> SegGptImageSegmentationOutput:
        if bool_masked_pos is None:
            bool_masked_pos = self.model._default_mask(
                jnp.asarray(pixel_values).shape[0])
        out = self.model(params["model"], pixel_values, prompt_pixel_values,
                         prompt_masks, bool_masked_pos, feature_ensemble,
                         embedding_type, labels)
        inter = jnp.concatenate(out.intermediate_hidden_states, axis=-1)
        pred_masks = self.decoder(params["decoder"], inter)
        loss = None
        if labels is not None:
            pm = jnp.asarray(prompt_masks, jnp.float32)
            lb = jnp.asarray(labels, jnp.float32)
            gt = jnp.concatenate([pm, lb], axis=2)
            ph = gt.shape[2] // self.config.patch_size
            pw = gt.shape[3] // self.config.patch_size
            mask = _patchify_mask(jnp.asarray(bool_masked_pos),
                                  self.config.patch_size, ph, pw)
            diff = jnp.abs(pred_masks.astype(jnp.float32) - gt)
            beta = self.config.beta
            sl1 = jnp.where(diff < beta, 0.5 * diff ** 2 / beta, diff - 0.5 * beta)
            loss = (sl1 * mask).sum() / mask.sum()
        return SegGptImageSegmentationOutput(loss=loss, pred_masks=pred_masks)
