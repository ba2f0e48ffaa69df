"""OwlViT zero-shot object detector, TPU-native.

Semantics match reference src/transformers/models/owlvit/modeling_owlvit.py:
CLIP-style dual encoder (text pooling always at argmax(input_ids) — the eot
token has the highest id, :38-41), the detection feature map = per-patch
vision states * broadcast class token, layer-normed (:1183-1199), a class
head whose logits are cosine similarities to text queries with a learned
per-patch shift and ELU+1 scale (:1002-1048), a 3-layer GELU box head whose
output is biased toward each patch's grid position before the sigmoid
(:983-1137), and padded-query masking via input_ids[..., 0] > 0 (:1465).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...utils.generic import ModelOutput
from ..clip.modeling_clip import CLIPTextTransformer, CLIPVisionEmbeddings, CLIPEncoder
from .configuration_owlvit import OwlViTConfig


@dataclass
class OwlViTObjectDetectionOutput(ModelOutput):
    logits: Any = None
    pred_boxes: Any = None
    text_embeds: Any = None
    image_embeds: Any = None
    class_embeds: Any = None


class OwlViTTextTransformer(CLIPTextTransformer):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        # OwlViT always pools at argmax(input_ids) (reference :38-41); the
        # CLIP base uses that path when eos_token_id == 2.
        self.eos_token_id = 2


class OwlViTVisionTransformer(Module):
    """CLIP vision tower with OwlViT's ``pre_layernorm`` name (no typo)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = CLIPVisionEmbeddings(config, **kw)
        self.pre_layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.encoder = CLIPEncoder(config, **kw)
        self.post_layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values):
        hidden = self.embeddings(params["embeddings"], pixel_values)
        hidden = self.pre_layernorm(params["pre_layernorm"], hidden)
        hidden, _ = self.encoder(params["encoder"], hidden, {"is_causal": False}, False)
        pooled = self.post_layernorm(params["post_layernorm"], hidden[:, 0:1])[:, 0]
        from ...modeling_outputs import BaseModelOutputWithPooling

        return BaseModelOutputWithPooling(last_hidden_state=hidden, pooler_output=pooled)


class OwlViTPreTrainedModel(PreTrainedModel):
    config_class = OwlViTConfig
    base_model_prefix = "owlvit"
    main_input_name = "pixel_values"


class OwlViTModel(Module):
    def __init__(self, config: OwlViTConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.text_model = OwlViTTextTransformer(config.text_config, **kw)
        self.vision_model = OwlViTVisionTransformer(config.vision_config, **kw)
        self.visual_projection = Linear(config.vision_config.hidden_size,
                                        config.projection_dim, False, **kw,
                                        kernel_init=normal_init(0.02))
        self.text_projection = Linear(config.text_config.hidden_size,
                                      config.projection_dim, False, **kw,
                                      kernel_init=normal_init(0.02))
        self.logit_scale_init_value = config.logit_scale_init_value

    def init(self, rng):
        params = super().init(rng)
        params["logit_scale"] = jnp.asarray(self.logit_scale_init_value, self.param_dtype)
        return params

    def get_text_features(self, params, input_ids, attention_mask=None):
        out = self.text_model(params["text_model"], input_ids, attention_mask)
        return self.text_projection(params["text_projection"], out.pooler_output)


class OwlViTModelStandalone(OwlViTPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.owlvit = OwlViTModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.owlvit(params["owlvit"], *args, **kwargs)


class _BoxHead(Module):
    def __init__(self, config, *, dtype, param_dtype, out_dim=4):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        w = config.vision_config.hidden_size
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.dense0 = Linear(w, w, True, **kw)
        self.dense1 = Linear(w, w, True, **kw)
        self.dense2 = Linear(w, out_dim, True, **kw)

    def __call__(self, params, x):
        x = jax.nn.gelu(self.dense0(params["dense0"], x), approximate=False)
        x = jax.nn.gelu(self.dense1(params["dense1"], x), approximate=False)
        return self.dense2(params["dense2"], x)


class _ClassHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        w = config.vision_config.hidden_size
        out = config.text_config.hidden_size
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.dense0 = Linear(w, out, True, **kw)
        self.logit_shift = Linear(w, 1, True, **kw)
        self.logit_scale = Linear(w, 1, True, **kw)

    def __call__(self, params, image_embeds, query_embeds, query_mask):
        img = self.dense0(params["dense0"], image_embeds)
        img = img / (jnp.linalg.norm(img, axis=-1, keepdims=True) + 1e-6)
        q = query_embeds / (jnp.linalg.norm(query_embeds, axis=-1, keepdims=True) + 1e-6)
        logits = jnp.einsum("bpd,bqd->bpq", img, q)
        shift = self.logit_shift(params["logit_shift"], image_embeds)
        scale = jax.nn.elu(self.logit_scale(params["logit_scale"], image_embeds)) + 1.0
        logits = (logits + shift) * scale
        if query_mask is not None:
            logits = jnp.where(query_mask[:, None, :] == 0,
                               jnp.finfo(jnp.float32).min, logits.astype(jnp.float32))
        return logits, img


def box_bias(num_h: int, num_w: int) -> np.ndarray:
    """Grid-position bias for box centers + patch-size bias (reference :1075)."""
    x = (np.arange(1, num_w + 1, dtype=np.float32))[None, :].repeat(num_h, 0) / num_w
    y = (np.arange(1, num_h + 1, dtype=np.float32))[:, None].repeat(num_w, 1) / num_h
    coords = np.clip(np.stack([x, y], -1).reshape(-1, 2), 0.0, 1.0)
    coord_bias = np.log(coords + 1e-4) - np.log1p(-coords + 1e-4)
    size = np.full_like(coord_bias, 1.0)
    size[:, 0] /= num_w
    size[:, 1] /= num_h
    size_bias = np.log(size + 1e-4) - np.log1p(-size + 1e-4)
    return np.concatenate([coord_bias, size_bias], axis=-1)


class OwlViTForObjectDetection(OwlViTPreTrainedModel):
    base_attr = "owlvit"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        setattr(self, self.base_attr, OwlViTModel(config, **kw))
        self.class_head = _ClassHead(config, **kw)
        self.box_head = _BoxHead(config, **kw)
        self.layer_norm = LayerNorm(config.vision_config.hidden_size,
                                    config.vision_config.layer_norm_eps, **kw)
        g = config.vision_config.image_size // config.vision_config.patch_size
        self.box_bias = box_bias(g, g)

    def __call__(self, params, input_ids=None, pixel_values=None, attention_mask=None,
                 **kwargs) -> OwlViTObjectDetectionOutput:
        b = pixel_values.shape[0]
        base = getattr(self, self.base_attr)
        base_params = params[self.base_attr]
        vision = base.vision_model(base_params["vision_model"],
                                   jnp.asarray(pixel_values, self.dtype))
        # feature map: patch states * broadcast class token, layer-normed
        img = vision.last_hidden_state
        # post_layernorm over the FULL sequence (reference :1184)
        img = base.vision_model.post_layernorm(
            base_params["vision_model"]["post_layernorm"], img)
        cls_tok = jnp.broadcast_to(img[:, :1], img[:, 1:].shape)
        image_feats = self.layer_norm(params["layer_norm"], img[:, 1:] * cls_tok)

        query_embeds = base.get_text_features(base_params, input_ids, attention_mask)
        max_queries = input_ids.shape[0] // b
        query_embeds = query_embeds.reshape(b, max_queries, -1)
        ids = jnp.asarray(input_ids).reshape(b, max_queries, -1)
        query_mask = (ids[..., 0] > 0).astype(jnp.int32)

        logits, class_embeds = self.class_head(params["class_head"], image_feats,
                                               query_embeds, query_mask)
        boxes = self.box_head(params["box_head"], image_feats)
        boxes = jax.nn.sigmoid(boxes + jnp.asarray(self.box_bias, boxes.dtype)[None])
        return OwlViTObjectDetectionOutput(
            logits=logits, pred_boxes=boxes, text_embeds=query_embeds,
            image_embeds=image_feats, class_embeds=class_embeds)

    @staticmethod
    def post_process_grounded_object_detection(outputs, threshold=0.1, target_sizes=None,
                                               text_labels=None):
        """reference processing post_process_grounded_object_detection: sigmoid
        scores, per-patch best query, cxcywh -> xyxy."""
        probs = jax.nn.sigmoid(outputs.logits.astype(jnp.float32))
        scores = probs.max(-1)
        labels = probs.argmax(-1)
        cx, cy, w, h = jnp.split(outputs.pred_boxes.astype(jnp.float32), 4, axis=-1)
        boxes = jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
        results = []
        for i in range(scores.shape[0]):
            s = np.asarray(scores[i])
            keep = s > threshold
            bx = np.asarray(boxes[i])[keep]
            lab = np.asarray(labels[i])[keep]
            if target_sizes is not None:
                th, tw = target_sizes[i]
                bx = bx * np.array([tw, th, tw, th])
            out = {"scores": s[keep], "labels": lab, "boxes": bx}
            if text_labels is not None:
                out["text_labels"] = [text_labels[i][int(l)] for l in lab]
            results.append(out)
        return results
