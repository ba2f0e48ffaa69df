"""SegFormer, TPU-native.

Semantics match reference src/transformers/models/segformer/modeling_segformer.py
(hub-checkpoint naming, i.e. the legacy attention.self.query/... layout):
overlapping patch-conv embeddings per stage (:65), efficient attention with
strided-conv sequence reduction of K/V (:87-205), Mix-FFN with a depthwise
conv replacing position embeddings (:206-245), pre-norm blocks, per-stage
final LayerNorm, and the all-MLP decode head — per-stage linear projection,
bilinear upsample to the stage-0 grid, 1x1 fuse conv + BatchNorm + ReLU and a
1x1 classifier (:465-533). Semantic-segmentation loss = CE over upsampled
logits with ignore_index.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core.module import BatchNorm, Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from ...utils.generic import ModelOutput
from .configuration_segformer import SegformerConfig


@dataclass
class SemanticSegmenterOutput(ModelOutput):
    loss: Any = None
    logits: Any = None
    hidden_states: Any = None


class SegformerOverlapPatchEmbeddings(Module):
    def __init__(self, patch_size, stride, in_ch, hidden, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.proj = Conv(in_ch, hidden, patch_size, stride=stride, padding=patch_size // 2,
                         use_bias=True, ndim=2, dtype=dtype, param_dtype=param_dtype)
        self.layer_norm = LayerNorm(hidden, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):  # [B, C, H, W]
        x = self.proj(params["proj"], x)
        b, c, h, w = x.shape
        x = x.reshape(b, c, h * w).transpose(0, 2, 1)
        return self.layer_norm(params["layer_norm"], x), h, w


class SegformerEfficientSelfAttention(Module):
    """Legacy naming: query/key/value/sr/layer_norm (hub checkpoints)."""

    def __init__(self, config, hidden, num_heads, sr_ratio, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = num_heads
        self.head_dim = hidden // num_heads
        self.sr_ratio = sr_ratio
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.query = Linear(hidden, hidden, True, **kw)
        self.key = Linear(hidden, hidden, True, **kw)
        self.value = Linear(hidden, hidden, True, **kw)
        if sr_ratio > 1:
            self.sr = Conv(hidden, hidden, sr_ratio, stride=sr_ratio, padding=0,
                           use_bias=True, ndim=2, dtype=dtype, param_dtype=param_dtype)
            self.layer_norm = LayerNorm(hidden, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x, h, w):
        b, n, c = x.shape
        q = self.query(params["query"], x).reshape(b, n, self.num_heads, self.head_dim)
        kv = x
        if self.sr_ratio > 1:
            kv = x.transpose(0, 2, 1).reshape(b, c, h, w)
            kv = self.sr(params["sr"], kv)
            kv = kv.reshape(b, c, -1).transpose(0, 2, 1)
            kv = self.layer_norm(params["layer_norm"], kv)
        m = kv.shape[1]
        k = self.key(params["key"], kv).reshape(b, m, self.num_heads, self.head_dim)
        v = self.value(params["value"], kv).reshape(b, m, self.num_heads, self.head_dim)
        out = eager_attention(q, k, v, scale=self.head_dim**-0.5, is_causal=False)
        return out.reshape(b, n, c)


class SegformerAttention(Module):
    def __init__(self, config, hidden, num_heads, sr_ratio, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self = SegformerEfficientSelfAttention(config, hidden, num_heads, sr_ratio, **kw)
        out = Module(**kw)
        out._children["dense"] = Linear(hidden, hidden, True, **kw,
                                        kernel_init=normal_init(config.initializer_range))
        self.output = out

    def __call__(self, params, x, h, w):
        a = self.self(params["self"], x, h, w)
        return self.output._children["dense"](params["output"]["dense"], a)


class SegformerMixFFN(Module):
    def __init__(self, config, in_features, hidden_features, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.dense1 = Linear(in_features, hidden_features, True, **lkw)
        dw = Module(**kw)
        dw._children["dwconv"] = Conv(hidden_features, hidden_features, 3, stride=1, padding=1,
                                      use_bias=True, groups=hidden_features, ndim=2, **kw)
        self.dwconv = dw
        self.dense2 = Linear(hidden_features, in_features, True, **lkw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x, h, w):
        b, n, _ = x.shape
        x = self.dense1(params["dense1"], x)
        c = x.shape[-1]
        x2 = x.transpose(0, 2, 1).reshape(b, c, h, w)
        x2 = self.dwconv._children["dwconv"](params["dwconv"]["dwconv"], x2)
        x = x2.reshape(b, c, n).transpose(0, 2, 1)
        return self.dense2(params["dense2"], self.act(x))


class SegformerLayer(Module):
    def __init__(self, config, hidden, num_heads, sr_ratio, mlp_ratio, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layer_norm_1 = LayerNorm(hidden, **kw)
        self.attention = SegformerAttention(config, hidden, num_heads, sr_ratio, **kw)
        self.layer_norm_2 = LayerNorm(hidden, **kw)
        self.mlp = SegformerMixFFN(config, hidden, int(hidden * mlp_ratio), **kw)

    def __call__(self, params, x, h, w):
        x = x + self.attention(params["attention"],
                               self.layer_norm_1(params["layer_norm_1"], x), h, w)
        return x + self.mlp(params["mlp"], self.layer_norm_2(params["layer_norm_2"], x), h, w)


class SegformerEncoder(Module):
    """Children named patch_embeddings.N / block.N.M / layer_norm.N (hub layout)."""

    def __init__(self, config: SegformerConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        pe = Module(**kw)
        blocks = Module(**kw)
        norms = Module(**kw)
        in_ch = config.num_channels
        for i in range(config.num_encoder_blocks):
            pe._children[str(i)] = SegformerOverlapPatchEmbeddings(
                config.patch_sizes[i], config.strides[i], in_ch, config.hidden_sizes[i], **kw)
            stage = Module(**kw)
            for j in range(config.depths[i]):
                stage._children[str(j)] = SegformerLayer(
                    config, config.hidden_sizes[i], config.num_attention_heads[i],
                    config.sr_ratios[i], config.mlp_ratios[i], **kw)
            blocks._children[str(i)] = stage
            norms._children[str(i)] = LayerNorm(config.hidden_sizes[i], **kw)
            in_ch = config.hidden_sizes[i]
        self.patch_embeddings = pe
        self.block = blocks
        self.layer_norm = norms

    def __call__(self, params, pixel_values):
        x = pixel_values
        stage_outputs = []
        b = x.shape[0]
        for i in range(self.config.num_encoder_blocks):
            x, h, w = self.patch_embeddings._children[str(i)](
                params["patch_embeddings"][str(i)], x)
            for j, layer in self.block._children[str(i)]._children.items():
                x = layer(params["block"][str(i)][j], x, h, w)
            x = self.layer_norm._children[str(i)](params["layer_norm"][str(i)], x)
            last = i == self.config.num_encoder_blocks - 1
            if not last or self.config.reshape_last_stage:
                x = x.reshape(b, h, w, -1).transpose(0, 3, 1, 2)
            stage_outputs.append(x)
        return stage_outputs


class SegformerPreTrainedModel(PreTrainedModel):
    config_class = SegformerConfig
    base_model_prefix = "segformer"
    main_input_name = "pixel_values"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked",)


class SegformerModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.encoder = SegformerEncoder(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values, output_hidden_states=False):
        stage_outputs = self.encoder(params["encoder"],
                                     jnp.asarray(pixel_values, self.dtype))
        from ...modeling_outputs import BaseModelOutput

        return BaseModelOutput(
            last_hidden_state=stage_outputs[-1],
            hidden_states=tuple(stage_outputs) if output_hidden_states else None)


class SegformerModelStandalone(SegformerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.segformer = SegformerModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.segformer(params["segformer"], pixel_values, **kwargs)


class SegformerDecodeHead(Module):
    """linear_c.N projections + bilinear upsample + 1x1 fuse + BN + classifier."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        linear_c = Module(**kw)
        for i in range(config.num_encoder_blocks):
            proj = Module(**kw)
            proj._children["proj"] = Linear(config.hidden_sizes[i], config.decoder_hidden_size,
                                            True, **lkw)
            linear_c._children[str(i)] = proj
        self.linear_c = linear_c
        self.linear_fuse = Conv(config.decoder_hidden_size * config.num_encoder_blocks,
                                config.decoder_hidden_size, 1, stride=1, padding=0,
                                use_bias=False, ndim=2, **kw)
        self.batch_norm = BatchNorm(config.decoder_hidden_size, **kw)
        self.classifier = Conv(config.decoder_hidden_size, config.num_labels, 1, stride=1,
                               padding=0, use_bias=True, ndim=2, **kw)
        self.config = config

    def __call__(self, params, stage_outputs):
        target_hw = stage_outputs[0].shape[2:]
        ups = []
        b = stage_outputs[0].shape[0]
        for i, feat in enumerate(stage_outputs):
            if feat.ndim == 3:  # unreshaped last stage
                hw = int(feat.shape[1] ** 0.5)
                feat = feat.reshape(b, hw, hw, -1).transpose(0, 3, 1, 2)
            h, w = feat.shape[2:]
            x = feat.reshape(b, feat.shape[1], h * w).transpose(0, 2, 1)
            x = self.linear_c._children[str(i)]._children["proj"](
                params["linear_c"][str(i)]["proj"], x)
            x = x.transpose(0, 2, 1).reshape(b, -1, h, w)
            x = jax.image.resize(x, (b, x.shape[1], *target_hw), method="bilinear")
            ups.append(x)
        fused = self.linear_fuse(params["linear_fuse"], jnp.concatenate(ups[::-1], axis=1))
        fused = jax.nn.relu(self.batch_norm(params["batch_norm"], fused))
        return self.classifier(params["classifier"], fused)


class SegformerForSemanticSegmentation(SegformerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.segformer = SegformerModel(config, **kw)
        self.decode_head = SegformerDecodeHead(config, **kw)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs) -> SemanticSegmenterOutput:
        out = self.segformer(params["segformer"], pixel_values, output_hidden_states=True)
        logits = self.decode_head(params["decode_head"], list(out.hidden_states))
        loss = None
        if labels is not None:
            # CE over logits upsampled to label resolution, ignoring 255
            up = jax.image.resize(logits.astype(jnp.float32),
                                  (logits.shape[0], logits.shape[1], *labels.shape[-2:]),
                                  method="bilinear")
            logp = jax.nn.log_softmax(up, axis=1)
            lab = jnp.asarray(labels)
            valid = lab != self.config.semantic_loss_ignore_index
            safe = jnp.where(valid, lab, 0)
            picked = jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
            loss = -(picked * valid).sum() / jnp.maximum(valid.sum(), 1)
        return SemanticSegmenterOutput(loss=loss, logits=logits)


class SegformerForImageClassification(SegformerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.segformer = SegformerModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_sizes[-1], config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        out = self.segformer(params["segformer"], pixel_values)
        feat = out.last_hidden_state
        if feat.ndim == 4:
            b, c = feat.shape[:2]
            feat = feat.reshape(b, c, -1).transpose(0, 2, 1)
        pooled = feat.mean(axis=1)
        logits = self.classifier(params["classifier"], pooled)
        from ...modeling_outputs import ImageClassifierOutput

        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ImageClassifierOutput(loss=loss, logits=logits)
