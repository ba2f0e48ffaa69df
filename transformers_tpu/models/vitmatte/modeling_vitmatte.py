"""ViTMatte (reference models/vitmatte/modeling_vitmatte.py): a VitDet
backbone over RGB+trimap input, a conv "detail capture" stream at full
resolution, and fusion blocks that upsample backbone features while folding
the detail maps back in; sigmoid matting head."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import BatchNorm, Conv, Module
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ..vitdet.modeling_vitdet import VitDetModel
from .configuration_vitmatte import VitMatteConfig


@dataclass
class ImageMattingOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    alphas: Optional[jnp.ndarray] = None


class VitMatteBasicConv3x3(Module):
    def __init__(self, config, in_ch, out_ch, stride=2, padding=1, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv = Conv(in_ch, out_ch, 3, stride=stride, padding=padding,
                         use_bias=False, ndim=2, **kw)
        self.batch_norm = BatchNorm(out_ch, config.batch_norm_eps, **kw)

    def __call__(self, params, x):
        h = self.batch_norm(params["batch_norm"], self.conv(params["conv"], x))
        return jax.nn.relu(h)


class VitMatteConvStream(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        in_ch = (config.backbone_config.num_channels
                 if config.backbone_config is not None else 4)
        chans = [in_ch] + config.convstream_hidden_sizes
        self.conv_chans = chans
        self.convs = [VitMatteBasicConv3x3(config, chans[i], chans[i + 1],
                                           dtype=dtype, param_dtype=param_dtype)
                      for i in range(len(chans) - 1)]

    def __call__(self, params, pixel_values):
        out = {"detailed_feature_map_0": pixel_values}
        h = pixel_values
        for i, conv in enumerate(self.convs):
            h = conv(params["convs"][str(i)], h)
            out[f"detailed_feature_map_{i + 1}"] = h
        return out


class VitMatteFusionBlock(Module):
    def __init__(self, config, in_ch, out_ch, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.conv = VitMatteBasicConv3x3(config, in_ch, out_ch, stride=1,
                                         padding=1, dtype=dtype,
                                         param_dtype=param_dtype)

    def __call__(self, params, features, detail):
        b, c, h, w = features.shape
        up = jax.image.resize(features.astype(jnp.float32),
                              (b, c, h * 2, w * 2), method="bilinear")
        up = up.astype(features.dtype)
        return self.conv(params["conv"], jnp.concatenate([detail, up], axis=1))


class VitMatteHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        in_ch = config.fusion_hidden_sizes[-1]
        mid = 16
        from ..luke.modeling_luke import _Container

        self.matting_convs = _Container({
            "0": Conv(in_ch, mid, 3, stride=1, padding=1, ndim=2, **kw),
            "1": BatchNorm(mid, 1e-5, **kw),
            "3": Conv(mid, 1, 1, stride=1, padding=0, ndim=2, **kw),
        }, **kw)

    def __call__(self, params, h):
        mods = self.matting_convs._children
        p = params["matting_convs"]
        h = mods["0"](p["0"], h)
        h = jax.nn.relu(mods["1"](p["1"], h))
        return mods["3"](p["3"], h)


class VitMatteDetailCaptureModule(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.convstream = VitMatteConvStream(config, **kw)
        chans = self.convstream.conv_chans
        fusion = [config.hidden_size] + config.fusion_hidden_sizes
        self.fusion_blocks = [VitMatteFusionBlock(
            config, fusion[i] + chans[-(i + 1)], fusion[i + 1], **kw)
            for i in range(len(fusion) - 1)]
        self.matting_head = VitMatteHead(config, **kw)

    def __call__(self, params, features, pixel_values):
        details = self.convstream(params["convstream"], pixel_values)
        n = len(self.fusion_blocks)
        for i, block in enumerate(self.fusion_blocks):
            features = block(params["fusion_blocks"][str(i)], features,
                             details[f"detailed_feature_map_{n - i - 1}"])
        return jax.nn.sigmoid(self.matting_head(params["matting_head"], features))


class VitMattePreTrainedModel(PreTrainedModel):
    config_class = VitMatteConfig
    main_input_name = "pixel_values"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked",)


class VitMatteForImageMatting(VitMattePreTrainedModel):
    def __init__(self, config: VitMatteConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.backbone = VitDetModel(config.backbone_config, **kw)
        self.decoder = VitMatteDetailCaptureModule(config, **kw)

    def __call__(self, params, pixel_values=None, labels=None,
                 **kwargs) -> ImageMattingOutput:
        px = jnp.asarray(pixel_values, self.dtype)
        out = self.backbone(params["backbone"], pixel_values=px)
        features = out.feature_maps[-1]
        alphas = self.decoder(params["decoder"], features, px)
        return ImageMattingOutput(alphas=alphas)
