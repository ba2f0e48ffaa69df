"""DETR object detector, TPU-native.

Semantics match reference src/transformers/models/detr/modeling_detr.py:
ResNet backbone with frozen BatchNorm (:179-292 — our core BatchNorm IS the
frozen form), normalized 2D sine position embeddings (:294-368), post-LN
transformer where position embeddings are RE-ADDED at every layer — to q/k in
encoder self-attention, to object queries in decoder self/cross attention and
to keys in cross attention (:430-575), zero-initialized object queries with
learned query position embeddings (:1127), class head (+1 no-object) and a
3-layer ReLU bbox MLP with sigmoid (:1317-1322).

Training loss (Hungarian bipartite matching + CE/L1/GIoU) lives in
``transformers_tpu.loss.object_detection`` — the matching runs on host
(scipy), the losses in jnp.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from ...utils.generic import ModelOutput
from ..resnet.modeling_resnet import ResNetModel
from .configuration_detr import DetrConfig


@dataclass
class DetrModelOutput(ModelOutput):
    last_hidden_state: Any = None
    encoder_last_hidden_state: Any = None


@dataclass
class DetrObjectDetectionOutput(ModelOutput):
    loss: Any = None
    loss_dict: Any = None
    logits: Any = None
    pred_boxes: Any = None
    last_hidden_state: Any = None
    encoder_last_hidden_state: Any = None


def sine_position_embedding(height: int, width: int, num_pos_feats: int,
                            mask: Optional[jnp.ndarray] = None,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """[H, W, 2*num_pos_feats] normalized sine embedding (reference :315-357,
    normalize=True). With a mask (per-batch) returns [B, H, W, D]."""
    scale = 2 * math.pi
    if mask is None:
        y = jnp.arange(1, height + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, width))
        x = jnp.arange(1, width + 1, dtype=jnp.float32)[None, :] * jnp.ones((height, 1))
        y = y[None]
        x = x[None]
    else:
        m = mask.astype(jnp.float32)
        y = jnp.cumsum(m, axis=1)
        x = jnp.cumsum(m, axis=2)
    eps = 1e-6
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)  # [B, H, W, D]


class DetrAttention(Module):
    """q/k get positional embeddings, v never does (reference :430-575)."""

    def __init__(self, config, hidden_size, num_heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = num_heads
        self.head_dim = hidden_size // num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.init_std))
        self.q_proj = Linear(hidden_size, hidden_size, True, **kw)
        self.k_proj = Linear(hidden_size, hidden_size, True, **kw)
        self.v_proj = Linear(hidden_size, hidden_size, True, **kw)
        self.out_proj = Linear(hidden_size, hidden_size, True, **kw)

    def __call__(self, params, hidden, kv=None, q_pos=None, k_pos=None, kv_valid=None):
        kv = hidden if kv is None else kv
        b, sq, e = hidden.shape
        skv = kv.shape[1]
        q_in = hidden + q_pos if q_pos is not None else hidden
        k_in = kv + k_pos if k_pos is not None else kv
        q = self.q_proj(params["q_proj"], q_in).reshape(b, sq, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], k_in).reshape(b, skv, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], kv).reshape(b, skv, self.num_heads, self.head_dim)
        out = eager_attention(q, k, v, scale=self.head_dim**-0.5, is_causal=False,
                              kv_valid=kv_valid)
        return self.out_proj(params["out_proj"], out.reshape(b, sq, e))


class DetrEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.init_std))
        self.self_attn = DetrAttention(config, config.d_model, config.encoder_attention_heads, **kw)
        self.self_attn_layer_norm = LayerNorm(config.d_model, **kw)
        self.fc1 = Linear(config.d_model, config.encoder_ffn_dim, True, **lkw)
        self.fc2 = Linear(config.encoder_ffn_dim, config.d_model, True, **lkw)
        self.final_layer_norm = LayerNorm(config.d_model, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, pos, kv_valid):
        h = self.self_attn(params["self_attn"], hidden, q_pos=pos, k_pos=pos, kv_valid=kv_valid)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden + h)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], hidden)))
        return self.final_layer_norm(params["final_layer_norm"], hidden + h)


class DetrDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.init_std))
        self.self_attn = DetrAttention(config, config.d_model, config.decoder_attention_heads, **kw)
        self.self_attn_layer_norm = LayerNorm(config.d_model, **kw)
        self.encoder_attn = DetrAttention(config, config.d_model, config.decoder_attention_heads, **kw)
        self.encoder_attn_layer_norm = LayerNorm(config.d_model, **kw)
        self.fc1 = Linear(config.d_model, config.decoder_ffn_dim, True, **lkw)
        self.fc2 = Linear(config.decoder_ffn_dim, config.d_model, True, **lkw)
        self.final_layer_norm = LayerNorm(config.d_model, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, query_pos, enc_hidden, enc_pos, enc_valid):
        h = self.self_attn(params["self_attn"], hidden, q_pos=query_pos, k_pos=query_pos)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden + h)
        h = self.encoder_attn(params["encoder_attn"], hidden, kv=enc_hidden,
                              q_pos=query_pos, k_pos=enc_pos, kv_valid=enc_valid)
        hidden = self.encoder_attn_layer_norm(params["encoder_attn_layer_norm"], hidden + h)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], hidden)))
        return self.final_layer_norm(params["final_layer_norm"], hidden + h)


class DetrEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = [DetrEncoderLayer(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.encoder_layers)]

    def __call__(self, params, hidden, pos, kv_valid):
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, pos, kv_valid)
        return hidden


class DetrDecoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layers = [DetrDecoderLayer(config, **kw) for _ in range(config.decoder_layers)]
        self.layernorm = LayerNorm(config.d_model, **kw)

    def __call__(self, params, hidden, query_pos, enc_hidden, enc_pos, enc_valid):
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, query_pos,
                           enc_hidden, enc_pos, enc_valid)
        return self.layernorm(params["layernorm"], hidden)


class DetrConvEncoder(Module):
    """ResNet backbone wrapper (reference :242; ``model`` = the backbone's
    ResNetModel tree so checkpoint keys line up)."""

    def __init__(self, config: DetrConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.backbone_config = config.backbone_config
        self.model = ResNetModel(config.backbone_config, dtype=dtype, param_dtype=param_dtype)
        sizes = [config.backbone_config.embedding_size] + list(config.backbone_config.hidden_sizes)
        names = config.backbone_config.stage_names
        self.out_channels = sizes[names.index(config.backbone_config.out_features[-1])]
        self.out_stage = names.index(config.backbone_config.out_features[-1])

    def __call__(self, params, pixel_values):
        x = self.model.embedder(params["model"]["embedder"],
                                jnp.asarray(pixel_values, self.dtype))
        _, hidden_states = self.model.encoder(params["model"]["encoder"], x)
        return hidden_states[self.out_stage]


class DetrModel(Module):
    def __init__(self, config: DetrConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        backbone = Module(**kw)
        backbone._children["conv_encoder"] = DetrConvEncoder(config, **kw)
        self.backbone = backbone
        self.input_projection = Conv(backbone._children["conv_encoder"].out_channels,
                                     config.d_model, 1, stride=1, padding=0, use_bias=True,
                                     ndim=2, **kw)
        self.query_position_embeddings = Embedding(config.num_queries, config.d_model,
                                                   embedding_init=normal_init(config.init_std), **kw)
        self.encoder = DetrEncoder(config, **kw)
        self.decoder = DetrDecoder(config, **kw)

    def __call__(self, params, pixel_values, pixel_mask=None):
        feat = self.backbone._children["conv_encoder"](
            params["backbone"]["conv_encoder"], pixel_values)  # [B, C, H, W]
        b, _, h, w = feat.shape
        proj = self.input_projection(params["input_projection"], feat)
        flat = proj.reshape(b, self.config.d_model, h * w).transpose(0, 2, 1)  # [B, HW, D]
        if pixel_mask is not None:
            # downsample the pixel mask to the feature grid (nearest)
            m = jax.image.resize(pixel_mask.astype(jnp.float32), (b, h, w), method="nearest")
            mask = m > 0.5
        else:
            mask = jnp.ones((b, h, w), bool)
        pos = sine_position_embedding(h, w, self.config.d_model // 2,
                                      mask=mask.astype(jnp.float32))
        pos = pos.reshape(b, h * w, self.config.d_model).astype(flat.dtype)
        kv_valid = mask.reshape(b, h * w).astype(jnp.int32)

        enc = self.encoder(params["encoder"], flat, pos, kv_valid)
        queries = jnp.broadcast_to(
            params["query_position_embeddings"]["weight"].astype(flat.dtype)[None],
            (b, self.config.num_queries, self.config.d_model))
        tgt = jnp.zeros_like(queries)
        dec = self.decoder(params["decoder"], tgt, queries, enc, pos, kv_valid)
        return DetrModelOutput(last_hidden_state=dec, encoder_last_hidden_state=enc)


class DetrPreTrainedModel(PreTrainedModel):
    config_class = DetrConfig
    base_model_prefix = "model"
    main_input_name = "pixel_values"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked",)


class DetrModelStandalone(DetrPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = DetrModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, pixel_mask=None, **kwargs):
        return self.model(params["model"], pixel_values, pixel_mask)


class DetrMLPPredictionHead(Module):
    """3-layer ReLU MLP (reference :1284)."""

    def __init__(self, input_dim, hidden_dim, output_dim, num_layers, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        dims = [input_dim] + [hidden_dim] * (num_layers - 1)
        outs = [hidden_dim] * (num_layers - 1) + [output_dim]
        container = Module(dtype=dtype, param_dtype=param_dtype)
        for i, (n, k) in enumerate(zip(dims, outs)):
            container._children[str(i)] = Linear(n, k, True, dtype=dtype, param_dtype=param_dtype,
                                                 kernel_init=normal_init(0.02))
        self.layers = container
        self.num_layers = num_layers

    def __call__(self, params, x):
        for i in range(self.num_layers):
            x = self.layers._children[str(i)](params["layers"][str(i)], x)
            if i < self.num_layers - 1:
                x = jax.nn.relu(x)
        return x


class DetrForObjectDetection(DetrPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = DetrModel(config, **kw)
        self.class_labels_classifier = Linear(config.d_model, config.num_labels + 1, True,
                                              **kw, kernel_init=normal_init(config.init_std))
        self.bbox_predictor = DetrMLPPredictionHead(config.d_model, config.d_model, 4, 3, **kw)

    def __call__(self, params, pixel_values=None, pixel_mask=None, labels=None,
                 **kwargs) -> DetrObjectDetectionOutput:
        out = self.model(params["model"], pixel_values, pixel_mask)
        logits = self.class_labels_classifier(params["class_labels_classifier"],
                                              out.last_hidden_state)
        pred_boxes = jax.nn.sigmoid(
            self.bbox_predictor(params["bbox_predictor"], out.last_hidden_state))
        loss = loss_dict = None
        if labels is not None:
            from ...loss.object_detection import detr_loss

            loss, loss_dict = detr_loss(logits, pred_boxes, labels, self.config)
        return DetrObjectDetectionOutput(
            loss=loss, loss_dict=loss_dict, logits=logits, pred_boxes=pred_boxes,
            last_hidden_state=out.last_hidden_state,
            encoder_last_hidden_state=out.encoder_last_hidden_state)

    @staticmethod
    def post_process_object_detection(outputs, threshold=0.5, target_sizes=None):
        """reference image_processing_detr post_process_object_detection:
        softmax over classes (drop no-object), boxes cxcywh -> xyxy scaled."""
        probs = jax.nn.softmax(outputs.logits.astype(jnp.float32), axis=-1)[..., :-1]
        scores = probs.max(-1)
        lab = probs.argmax(-1)
        cx, cy, bw, bh = jnp.split(outputs.pred_boxes.astype(jnp.float32), 4, axis=-1)
        boxes = jnp.concatenate([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1)
        results = []
        for i in range(scores.shape[0]):
            s = np.asarray(scores[i])
            keep = s > threshold
            b = np.asarray(boxes[i])[keep]
            if target_sizes is not None:
                th, tw = target_sizes[i]
                b = b * np.array([tw, th, tw, th])
            results.append({"scores": s[keep], "labels": np.asarray(lab[i])[keep], "boxes": b})
        return results
