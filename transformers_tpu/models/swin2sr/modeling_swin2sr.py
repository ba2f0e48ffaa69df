"""Swin2SR (reference models/swin2sr/modeling_swin2sr.py): SwinV2 blocks at
patch size 1 with NO downsampling — every stage is a Residual Swin
Transformer Block (layers -> conv -> +residual at constant resolution) —
a conv stem/body skip, and pixel-shuffle super-resolution heads
(pixelshuffle / pixelshuffledirect / nearest+conv / pixelshuffle_aux /
plain denoise conv). Reuses our Swinv2 cosine window attention."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Conv, LayerNorm, Module
from ...core.loading import WeightRule
from ...modeling_outputs import BaseModelOutput, ImageSuperResolutionOutput
from ...modeling_utils import PreTrainedModel
from ..swinv2.modeling_swinv2 import SWINV2_WEIGHT_RULES, Swinv2Layer
from .configuration_swin2sr import Swin2SRConfig

RGB_MEAN = jnp.asarray([0.4488, 0.4371, 0.4040]).reshape(1, 3, 1, 1)


def pixel_shuffle(x, r: int):
    """torch.nn.PixelShuffle: [N, C*r^2, H, W] -> [N, C, H*r, W*r]."""
    n, c, h, w = x.shape
    x = x.reshape(n, c // (r * r), r, r, h, w)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(n, c // (r * r), h * r, w * r)


class Swin2SRStage(Module):
    """RSTB (reference Swin2SRStage:549): swin layers -> conv -> +residual."""

    def __init__(self, config, resolution, depth, num_heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        dim = config.embed_dim
        self.resolution = resolution
        self.layers = [
            Swinv2Layer(config, dim, resolution, num_heads,
                        shift_size=0 if i % 2 == 0 else config.window_size // 2,
                        pretrained_ws=0, **kw)
            for i in range(depth)
        ]
        self.resi_connection = config.resi_connection
        if config.resi_connection == "1conv":
            self.conv = Conv(dim, dim, 3, 1, 1, **kw)
        else:  # "3conv" parameter-saving bottleneck
            self.conv_1 = Conv(dim, dim // 4, 3, 1, 1, **kw)
            self.conv_2 = Conv(dim // 4, dim // 4, 1, 1, 0, **kw)
            self.conv_3 = Conv(dim // 4, dim, 3, 1, 1, **kw)
        # the stage's re-embedding projection (normalize_patches=False)
        self.patch_embed = Conv(dim, dim, config.patch_size,
                                config.patch_size, 0, **kw)

    def __call__(self, params, hidden):
        h, w = self.resolution
        residual = hidden
        x = hidden
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][str(i)], x)
        b, _, c = x.shape
        img = x.transpose(0, 2, 1).reshape(b, c, h, w)
        if self.resi_connection == "1conv":
            img = self.conv(params["conv"], img)
        else:
            img = self.conv_1(params["conv_1"], img)
            img = jax.nn.leaky_relu(img, 0.2)
            img = self.conv_2(params["conv_2"], img)
            img = jax.nn.leaky_relu(img, 0.2)
            img = self.conv_3(params["conv_3"], img)
        img = self.patch_embed(params["patch_embed"], img)
        x = img.reshape(b, c, h * w).transpose(0, 2, 1)
        return x + residual


class Swin2SRModel(Module):
    def __init__(self, config: Swin2SRConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ws = config.window_size
        size = config.image_size if isinstance(config.image_size, (list, tuple)) \
            else (config.image_size, config.image_size)
        self.padded = (size[0] + (ws - size[0] % ws) % ws,
                       size[1] + (ws - size[1] % ws) % ws)
        self.first_convolution = Conv(config.num_channels, config.embed_dim, 3, 1, 1, **kw)
        self.projection = Conv(config.embed_dim, config.embed_dim,
                               config.patch_size, config.patch_size, 0, **kw)
        self.patch_norm = LayerNorm(config.embed_dim, 1e-5, **kw)
        self.stages = [
            Swin2SRStage(config, self.padded, config.depths[i],
                         config.num_heads[i], **kw)
            for i in range(len(config.depths))
        ]
        self.layernorm = LayerNorm(config.embed_dim, config.layer_norm_eps, **kw)
        self.conv_after_body = Conv(config.embed_dim, config.embed_dim, 3, 1, 1, **kw)

    def pad_and_normalize(self, pixel_values):
        h, w = pixel_values.shape[-2:]
        ph, pw = (self.padded[0] - h, self.padded[1] - w)
        if ph or pw:
            pixel_values = jnp.pad(pixel_values,
                                   ((0, 0), (0, 0), (0, ph), (0, pw)),
                                   mode="reflect")
        cfg = self.config
        mean = (RGB_MEAN if cfg.num_channels == 3 and cfg.num_channels_out == 3
                else jnp.zeros((1, 1, 1, 1)))
        return (pixel_values - mean.astype(pixel_values.dtype)) * cfg.img_range

    def __call__(self, params, pixel_values, output_hidden_states=False):
        x = self.pad_and_normalize(pixel_values.astype(self.dtype))
        embeds = self.first_convolution(params["first_convolution"], x)
        proj = self.projection(params["projection"], embeds)
        b, c, h, w = proj.shape
        seq = proj.reshape(b, c, h * w).transpose(0, 2, 1)
        seq = self.patch_norm(params["patch_norm"], seq)
        hidden_states = [] if output_hidden_states else None
        for i, stage in enumerate(self.stages):
            seq = stage(params["stages"][str(i)], seq)
            if output_hidden_states:
                hidden_states.append(seq)
        seq = self.layernorm(params["layernorm"], seq)
        img = seq.transpose(0, 2, 1).reshape(b, c, h, w)
        img = self.conv_after_body(params["conv_after_body"], img) + embeds
        return BaseModelOutput(last_hidden_state=img,
                               hidden_states=tuple(hidden_states) if hidden_states else None)


class Upsample(Module):
    """log2-staged conv + pixel shuffle (reference Upsample:801)."""

    def __init__(self, scale, num_features, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.scale = scale
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        if scale & (scale - 1) == 0:
            self.n_steps = scale.bit_length() - 1
            for i in range(self.n_steps):
                setattr(self, f"convolution_{i}",
                        Conv(num_features, 4 * num_features, 3, 1, 1, **kw))
        elif scale == 3:
            self.n_steps = 0
            self.convolution = Conv(num_features, 9 * num_features, 3, 1, 1, **kw)
        else:
            raise ValueError(f"Scale {scale} unsupported (2^n or 3)")

    def __call__(self, params, x):
        if self.scale & (self.scale - 1) == 0:
            for i in range(self.n_steps):
                conv = getattr(self, f"convolution_{i}")
                x = pixel_shuffle(conv(params[f"convolution_{i}"], x), 2)
            return x
        return pixel_shuffle(self.convolution(params["convolution"], x), 3)


class Swin2SRPreTrainedModel(PreTrainedModel):
    config_class = Swin2SRConfig
    base_model_prefix = "swin2sr"


SWIN2SR_WEIGHT_RULES = SWINV2_WEIGHT_RULES + (
    # swin2sr names the blocks "layers" (swinv2: "blocks") — the mlp.fc2
    # rename must still hit its output.dense
    WeightRule(pattern=r"(.*layers\.\d+)\.output\.dense\.(.*)",
               rename=r"\1.mlp.fc2.\2"),
    WeightRule(pattern=r"(.*)embeddings\.patch_embeddings\.layernorm\.(.*)",
               rename=r"\1patch_norm.\2"),
    WeightRule(pattern=r"(.*)embeddings\.patch_embeddings\.projection\.(.*)",
               rename=r"\1projection.\2"),
    WeightRule(pattern=r"(.*)\.patch_embed\.projection\.(.*)",
               rename=r"\1.patch_embed.\2"),
    WeightRule(pattern=r"(.*)encoder\.stages\.(.*)", rename=r"\1stages.\2"),
    # stage-internal conv sequential numbering (3conv variant)
    WeightRule(pattern=r"(.*)\.conv\.0\.(.*)", rename=r"\1.conv_1.\2"),
    WeightRule(pattern=r"(.*)\.conv\.2\.(.*)", rename=r"\1.conv_2.\2"),
    WeightRule(pattern=r"(.*)\.conv\.4\.(.*)", rename=r"\1.conv_3.\2"),
    # aux upsampler sequential
    WeightRule(pattern=r"(.*)\.conv_after_aux\.0\.(.*)", rename=r"\1.conv_after_aux.\2"),
    # torch nests the SR head under `upsample.` (PixelShuffleUpsampler et
    # al.); ours flattens it onto the model
    WeightRule(pattern=r"^upsample\.upsample\.(.*)", rename=r"upsample.\1"),
    WeightRule(pattern=r"^upsample\.conv\.(.*)", rename=r"upsample_conv.\1"),
    WeightRule(pattern=r"^upsample\.(conv_before_upsample|final_convolution|conv_up1|conv_up2|conv_hr|conv_bicubic|conv_aux|conv_after_aux)\.(.*)",
               rename=r"\1.\2"),
)


class Swin2SRForImageSuperResolution(Swin2SRPreTrainedModel):
    """Reference Swin2SRForImageSuperResolution:943.

    Drops keys the reference never uses at inference: none. The embeddings'
    patch projection is identity at patch_size 1 in released checkpoints
    (projection == 1x1 conv) — loaded via the swinv2 rules."""

    _weight_rules = SWIN2SR_WEIGHT_RULES

    def __init__(self, config: Swin2SRConfig, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.swin2sr = Swin2SRModel(config, **kw)
        self.upsampler = config.upsampler
        self.upscale = config.upscale
        nf = 64
        if config.upsampler == "pixelshuffle":
            self.conv_before_upsample = Conv(config.embed_dim, nf, 3, 1, 1, **kw)
            self.upsample = Upsample(config.upscale, nf, **kw)
            self.final_convolution = Conv(nf, config.num_channels_out, 3, 1, 1, **kw)
        elif config.upsampler == "pixelshuffledirect":
            self.upsample_conv = Conv(config.embed_dim,
                                      config.upscale ** 2 * config.num_channels_out,
                                      3, 1, 1, **kw)
        elif config.upsampler == "nearest+conv":
            self.conv_before_upsample = Conv(config.embed_dim, nf, 3, 1, 1, **kw)
            self.conv_up1 = Conv(nf, nf, 3, 1, 1, **kw)
            self.conv_up2 = Conv(nf, nf, 3, 1, 1, **kw)
            self.conv_hr = Conv(nf, nf, 3, 1, 1, **kw)
            self.final_convolution = Conv(nf, config.num_channels_out, 3, 1, 1, **kw)
        elif config.upsampler == "pixelshuffle_aux":
            self.conv_bicubic = Conv(config.num_channels, nf, 3, 1, 1, **kw)
            self.conv_before_upsample = Conv(config.embed_dim, nf, 3, 1, 1, **kw)
            self.conv_aux = Conv(nf, config.num_channels, 3, 1, 1, **kw)
            self.conv_after_aux = Conv(3, nf, 3, 1, 1, **kw)
            self.upsample = Upsample(config.upscale, nf, **kw)
            self.final_convolution = Conv(nf, config.num_channels_out, 3, 1, 1, **kw)
        else:  # denoise / jpeg artifact removal
            self.final_convolution = Conv(config.embed_dim,
                                          config.num_channels_out, 3, 1, 1, **kw)

    def __call__(self, params, pixel_values=None, labels=None,
                 output_hidden_states=False, **kwargs):
        cfg = self.config
        height, width = pixel_values.shape[-2:]
        body = self.swin2sr(params["swin2sr"], pixel_values,
                            output_hidden_states=output_hidden_states)
        seq = body.last_hidden_state
        lrelu = lambda x: jax.nn.leaky_relu(x, 0.01)
        if self.upsampler == "pixelshuffle":
            x = lrelu(self.conv_before_upsample(params["conv_before_upsample"], seq))
            x = self.upsample(params["upsample"], x)
            rec = self.final_convolution(params["final_convolution"], x)
        elif self.upsampler == "pixelshuffledirect":
            rec = pixel_shuffle(self.upsample_conv(params["upsample_conv"], seq),
                                self.upscale)
        elif self.upsampler == "nearest+conv":
            x = lrelu(self.conv_before_upsample(params["conv_before_upsample"], seq))
            up = lambda t: jax.image.resize(
                t, t.shape[:2] + (t.shape[2] * 2, t.shape[3] * 2), "nearest")
            x = jax.nn.leaky_relu(self.conv_up1(params["conv_up1"], up(x)), 0.2)
            x = jax.nn.leaky_relu(self.conv_up2(params["conv_up2"], up(x)), 0.2)
            x = jax.nn.leaky_relu(self.conv_hr(params["conv_hr"], x), 0.2)
            rec = self.final_convolution(params["final_convolution"], x)
        elif self.upsampler == "pixelshuffle_aux":
            bic = jax.image.resize(
                pixel_values.astype(self.dtype),
                pixel_values.shape[:2] + (height * self.upscale,
                                          width * self.upscale), "cubic")
            bic = self.conv_bicubic(params["conv_bicubic"], bic)
            x = lrelu(self.conv_before_upsample(params["conv_before_upsample"], seq))
            aux = self.conv_aux(params["conv_aux"], x)
            x = lrelu(self.conv_after_aux(params["conv_after_aux"], aux))
            hs, ws_ = seq.shape[-2:]
            x = self.upsample(params["upsample"], x)
            x = x[:, :, : hs * self.upscale, : ws_ * self.upscale] \
                + bic[:, :, : hs * self.upscale, : ws_ * self.upscale]
            rec = self.final_convolution(params["final_convolution"], x)
        else:
            rec = pixel_values + self.final_convolution(
                params["final_convolution"], seq[:, :, :height, :width])

        mean = (RGB_MEAN if cfg.num_channels == 3 and cfg.num_channels_out == 3
                else jnp.zeros((1, 1, 1, 1))).astype(rec.dtype)
        rec = rec / cfg.img_range + mean
        rec = rec[:, :, : height * self.upscale, : width * self.upscale]
        loss = None
        if labels is not None:
            loss = jnp.abs(rec - labels).mean()  # L1 (reference uses MSE/L1 externally)
        return ImageSuperResolutionOutput(loss=loss, reconstruction=rec,
                                          hidden_states=body.hidden_states)
