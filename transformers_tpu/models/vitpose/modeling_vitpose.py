"""VitPose (reference models/vitpose/modeling_vitpose.py).

Pose estimation: the VitPose ViT backbone's patch sequence is reshaped to a
[B, C, Hp, Wp] feature map (:260-266) and decoded to keypoint heatmaps by
either the simple head (ReLU -> 4x bilinear upsample -> 3x3 conv, :120-145)
or the classic head (two deconv+BN+ReLU blocks -> 1x1 conv, :147-187).
``flip_pairs`` mirroring (:96-117) is supported for test-time augmentation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import BatchNorm, Conv, ConvTranspose, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...utils.generic import ModelOutput
from ..vitpose_backbone.modeling_vitpose_backbone import (
    VitPoseBackbone,
    VitPoseBackboneConfig,
)


class VitPoseConfig(PretrainedConfig):
    model_type = "vitpose"
    sub_configs = {"backbone_config": VitPoseBackboneConfig}

    def __init__(self, backbone_config=None, backbone=None,
                 use_pretrained_backbone=False, use_timm_backbone=False,
                 backbone_kwargs=None, initializer_range=0.02, scale_factor=4,
                 use_simple_decoder=True, **kwargs):
        if backbone_config is None:
            backbone_config = VitPoseBackboneConfig(out_indices=[-1])
        elif isinstance(backbone_config, dict):
            backbone_config = VitPoseBackboneConfig(**backbone_config)
        self.backbone_config = backbone_config
        self.backbone = backbone
        self.use_pretrained_backbone = use_pretrained_backbone
        self.use_timm_backbone = use_timm_backbone
        self.backbone_kwargs = backbone_kwargs
        self.initializer_range = initializer_range
        self.scale_factor = scale_factor
        self.use_simple_decoder = use_simple_decoder
        super().__init__(**kwargs)


@dataclass
class VitPoseEstimatorOutput(ModelOutput):
    loss: Any = None
    heatmaps: Any = None
    hidden_states: Any = None


def flip_back(output_flipped, flip_pairs):
    """Mirror heatmaps and swap left/right keypoint channels (reference :96)."""
    left, right = flip_pairs[:, 0], flip_pairs[:, 1]
    swapped = output_flipped
    swapped = swapped.at[:, left].set(output_flipped[:, right])
    swapped = swapped.at[:, right].set(output_flipped[:, left])
    return swapped[..., ::-1]


class VitPoseSimpleDecoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.scale_factor = config.scale_factor
        self.conv = Conv(config.backbone_config.hidden_size, config.num_labels, 3,
                         stride=1, padding=1, use_bias=True, ndim=2,
                         dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, flip_pairs=None):
        h = jax.nn.relu(hidden)
        b, c, hh, ww = h.shape
        h = jax.image.resize(h, (b, c, hh * self.scale_factor, ww * self.scale_factor),
                             method="bilinear")
        heatmaps = self.conv(params["conv"], h)
        if flip_pairs is not None:
            heatmaps = flip_back(heatmaps, flip_pairs)
        return heatmaps


class VitPoseClassicDecoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        hid = config.backbone_config.hidden_size
        self.deconv1 = ConvTranspose(hid, 256, 4, stride=2, padding=1,
                                     use_bias=False, ndim=2, **kw)
        self.batchnorm1 = BatchNorm(256, 1e-5, **kw)
        self.deconv2 = ConvTranspose(256, 256, 4, stride=2, padding=1,
                                     use_bias=False, ndim=2, **kw)
        self.batchnorm2 = BatchNorm(256, 1e-5, **kw)
        self.conv = Conv(256, config.num_labels, 1, stride=1, padding=0,
                         use_bias=True, ndim=2, **kw)

    def __call__(self, params, hidden, flip_pairs=None):
        h = jax.nn.relu(self.batchnorm1(params["batchnorm1"],
                                        self.deconv1(params["deconv1"], hidden)))
        h = jax.nn.relu(self.batchnorm2(params["batchnorm2"],
                                        self.deconv2(params["deconv2"], h)))
        heatmaps = self.conv(params["conv"], h)
        if flip_pairs is not None:
            heatmaps = flip_back(heatmaps, flip_pairs)
        return heatmaps


class VitPosePreTrainedModel(PreTrainedModel):
    config_class = VitPoseConfig
    base_model_prefix = "vit"
    main_input_name = "pixel_values"


class VitPoseForPoseEstimation(VitPosePreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.backbone = VitPoseBackbone(config.backbone_config, **kw)
        self.head = (VitPoseSimpleDecoder(config, **kw) if config.use_simple_decoder
                     else VitPoseClassicDecoder(config, **kw))

    def __call__(self, params, pixel_values, dataset_index=None, flip_pairs=None,
                 output_hidden_states=False, **kwargs) -> VitPoseEstimatorOutput:
        outputs = self.backbone(params["backbone"], pixel_values, dataset_index,
                                output_hidden_states=output_hidden_states)
        seq = outputs.last_hidden_state  # [B, P, C]
        bc = self.config.backbone_config
        ph = bc.image_size[0] // bc.patch_size[0]
        pw = bc.image_size[1] // bc.patch_size[1]
        b = seq.shape[0]
        fmap = seq.transpose(0, 2, 1).reshape(b, -1, ph, pw)
        heatmaps = self.head(params["head"], fmap, flip_pairs=flip_pairs)
        return VitPoseEstimatorOutput(heatmaps=heatmaps,
                                      hidden_states=outputs.hidden_states)
