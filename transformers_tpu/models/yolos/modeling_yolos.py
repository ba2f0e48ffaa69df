"""YOLOS, TPU-native (reference src/transformers/models/yolos/modeling_yolos.py).

Detection with a plain ViT: 100 learned detection tokens are appended to
the patch sequence, the standard ViT encoder runs (optionally adding
per-layer "mid" position embeddings), and DETR-style MLP heads read the
detection-token outputs.  Position embeddings are bicubically resized when
the input geometry differs from the pretraining grid.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core.module import LayerNorm, Module
from ...modeling_utils import PreTrainedModel
from ...utils.generic import ModelOutput
from ..detr.modeling_detr import DetrForObjectDetection, DetrMLPPredictionHead
from ..vit.modeling_vit import ViTLayer, ViTPatchEmbeddings
from .configuration_yolos import YolosConfig


@dataclass
class YolosObjectDetectionOutput(ModelOutput):
    loss: Any = None
    loss_dict: Any = None
    logits: Any = None
    pred_boxes: Any = None
    last_hidden_state: Any = None


def _resize_pos(patch_pos, old_hw, new_hw):
    """[1, N, D] grid positions → bicubic resize to a new grid."""
    if old_hw == new_hw:
        return patch_pos
    b, n, d = patch_pos.shape
    grid = patch_pos.reshape(b, old_hw[0], old_hw[1], d)
    grid = jax.image.resize(grid, (b, new_hw[0], new_hw[1], d), method="bicubic")
    return grid.reshape(b, new_hw[0] * new_hw[1], d)


class YolosEmbeddings(Module):
    def __init__(self, config: YolosConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_embeddings = ViTPatchEmbeddings(config, **{
            "dtype": dtype, "param_dtype": param_dtype})
        self.num_patches = ((config.image_size[0] // config.patch_size)
                            * (config.image_size[1] // config.patch_size))

    def init(self, rng):
        params = super().init(rng)
        d = self.config.hidden_size
        params["cls_token"] = jnp.zeros((1, 1, d), self.param_dtype)
        params["detection_tokens"] = jnp.zeros(
            (1, self.config.num_detection_tokens, d), self.param_dtype)
        params["position_embeddings"] = jnp.zeros(
            (1, self.num_patches + self.config.num_detection_tokens + 1, d),
            self.param_dtype)
        return params

    def __call__(self, params, pixel_values):
        b, _, h, w = pixel_values.shape
        cfg = self.config
        emb = self.patch_embeddings(params["patch_embeddings"], pixel_values)
        cls = jnp.broadcast_to(params["cls_token"].astype(emb.dtype),
                               (b, 1, emb.shape[-1]))
        det = jnp.broadcast_to(params["detection_tokens"].astype(emb.dtype),
                               (b, cfg.num_detection_tokens, emb.shape[-1]))
        emb = jnp.concatenate([cls, emb, det], axis=1)
        pos = params["position_embeddings"].astype(emb.dtype)
        nd = cfg.num_detection_tokens
        old = (cfg.image_size[0] // cfg.patch_size, cfg.image_size[1] // cfg.patch_size)
        new = (h // cfg.patch_size, w // cfg.patch_size)
        patch_pos = _resize_pos(pos[:, 1:-nd], old, new)
        pos = jnp.concatenate([pos[:, :1], patch_pos, pos[:, -nd:]], axis=1)
        return emb + pos


class YolosModel(Module):
    def __init__(self, config: YolosConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = YolosEmbeddings(config, **kw)
        self.encoder = _YolosEncoder(config, **kw)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values):
        h, w = pixel_values.shape[-2:]
        hidden = self.embeddings(params["embeddings"],
                                 jnp.asarray(pixel_values, self.dtype))
        hidden = self.encoder(params["encoder"], hidden, (h, w))
        return self.layernorm(params["layernorm"], hidden)


class _YolosEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer = [ViTLayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]
        self.seq_length = (1 + (config.image_size[0] * config.image_size[1]
                                // config.patch_size**2)
                           + config.num_detection_tokens)

    def init(self, rng):
        params = super().init(rng)
        if self.config.use_mid_position_embeddings:
            params["mid_position_embeddings"] = jnp.zeros(
                (self.config.num_hidden_layers - 1, 1, self.seq_length,
                 self.config.hidden_size), self.param_dtype)
        return params

    def __call__(self, params, hidden, img_hw):
        cfg = self.config
        mid = None
        if cfg.use_mid_position_embeddings:
            mid = params["mid_position_embeddings"].astype(hidden.dtype)
            nd = cfg.num_detection_tokens
            old = (cfg.image_size[0] // cfg.patch_size,
                   cfg.image_size[1] // cfg.patch_size)
            new = (img_hw[0] // cfg.patch_size, img_hw[1] // cfg.patch_size)
            if old != new:
                depth = mid.shape[0]
                patch = mid[:, :, 1:-nd].reshape(depth, old[0], old[1], -1)
                patch = jax.image.resize(
                    patch, (depth, new[0], new[1], patch.shape[-1]), method="bicubic")
                mid = jnp.concatenate(
                    [mid[:, :, :1], patch.reshape(depth, 1, -1, mid.shape[-1]),
                     mid[:, :, -nd:]], axis=2)
        for i, layer in enumerate(self.layer):
            hidden = layer(params["layer"][str(i)], hidden)
            if mid is not None and i < cfg.num_hidden_layers - 1:
                hidden = hidden + mid[i]
        return hidden


class YolosPreTrainedModel(PreTrainedModel):
    config_class = YolosConfig
    base_model_prefix = "vit"
    main_input_name = "pixel_values"


class YolosModelStandalone(YolosPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.vit = YolosModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        from ...modeling_outputs import BaseModelOutput

        return BaseModelOutput(last_hidden_state=self.vit(params["vit"], pixel_values))


class YolosForObjectDetection(YolosPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vit = YolosModel(config, **kw)
        self.class_labels_classifier = DetrMLPPredictionHead(
            config.hidden_size, config.hidden_size, config.num_labels + 1, 3, **kw)
        self.bbox_predictor = DetrMLPPredictionHead(
            config.hidden_size, config.hidden_size, 4, 3, **kw)

    def __call__(self, params, pixel_values=None, labels=None,
                 **kwargs) -> YolosObjectDetectionOutput:
        hidden = self.vit(params["vit"], pixel_values)
        det = hidden[:, -self.config.num_detection_tokens:]
        logits = self.class_labels_classifier(params["class_labels_classifier"], det)
        pred_boxes = jax.nn.sigmoid(self.bbox_predictor(params["bbox_predictor"], det))
        loss = loss_dict = None
        if labels is not None:
            from ...loss.object_detection import detr_loss

            loss, loss_dict = detr_loss(logits, pred_boxes, labels, self.config)
        return YolosObjectDetectionOutput(loss=loss, loss_dict=loss_dict,
                                          logits=logits, pred_boxes=pred_boxes,
                                          last_hidden_state=hidden)

    post_process_object_detection = staticmethod(
        DetrForObjectDetection.post_process_object_detection)
