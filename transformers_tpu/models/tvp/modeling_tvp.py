"""TVP (reference models/tvp/modeling_tvp.py): text-visual prompting for
video grounding — a ResNet grid encoder pools video frames, learnable pad
prompts frame the pixels, a 10-token text prompt prefixes the joint
[prompt | text | visual] BERT-style encoder, and a 2-way sigmoid head
predicts the (start, end) fractions."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import PretrainedConfig
from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..auto.configuration_auto import get_config_class
from ..resnet.modeling_resnet import ResNetEmbeddings, ResNetEncoder

NEG = float(np.finfo(np.float32).min)


class TvpConfig(PretrainedConfig):
    model_type = "tvp"
    sub_configs = {"backbone_config": "auto"}

    def __init__(self, backbone_config=None, distance_loss_weight=1.0,
                 duration_loss_weight=0.1, visual_prompter_type="framepad",
                 visual_prompter_apply="replace", visual_prompt_size=96,
                 max_img_size=448, num_frames=48, vocab_size=30522,
                 type_vocab_size=2, hidden_size=768, intermediate_size=3072,
                 num_hidden_layers=12, num_attention_heads=12,
                 max_position_embeddings=512,
                 max_grid_col_position_embeddings=100,
                 max_grid_row_position_embeddings=100,
                 hidden_dropout_prob=0.1, hidden_act="gelu",
                 layer_norm_eps=1e-12, initializer_range=0.02,
                 attention_probs_dropout_prob=0.1, pad_token_id=None,
                 **kwargs):
        if isinstance(backbone_config, dict):
            backbone_config = get_config_class(
                backbone_config.get("model_type", "resnet"))(**backbone_config)
        elif backbone_config is None:
            backbone_config = get_config_class("resnet")(
                out_features=["stage4"])
        self.backbone_config = backbone_config
        self.distance_loss_weight = distance_loss_weight
        self.duration_loss_weight = duration_loss_weight
        self.visual_prompter_type = visual_prompter_type
        self.visual_prompter_apply = visual_prompter_apply
        self.visual_prompt_size = visual_prompt_size
        self.max_img_size = max_img_size
        self.num_frames = num_frames
        self.vocab_size = vocab_size
        self.type_vocab_size = type_vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.max_position_embeddings = max_position_embeddings
        self.max_grid_col_position_embeddings = max_grid_col_position_embeddings
        self.max_grid_row_position_embeddings = max_grid_row_position_embeddings
        self.hidden_dropout_prob = hidden_dropout_prob
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.initializer_range = initializer_range
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        super().__init__(pad_token_id=pad_token_id, **kwargs)


@dataclass
class TvpVideoGroundingOutput(ModelOutput):
    loss: Any = None
    logits: Any = None
    hidden_states: Any = None


class TvpVisionModel(Module):
    """reference :136 — backbone stage4 map -> 3x3 conv -> 2x2 maxpool+relu."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        bc = config.backbone_config
        backbone = Module(**kw)
        backbone._children["embedder"] = ResNetEmbeddings(bc, **kw)
        backbone._children["encoder"] = ResNetEncoder(bc, **kw)
        self.backbone = backbone
        self.out_stage = bc.stage_names.index(bc.out_features[-1])
        self.grid_encoder_conv = Conv(bc.hidden_sizes[-1], config.hidden_size,
                                      3, padding=1, use_bias=False, **kw)

    def __call__(self, params, pixel_values):  # [B, F, C, H, W]
        b, f = pixel_values.shape[:2]
        flat = pixel_values.reshape((b * f,) + pixel_values.shape[2:])
        x = self.backbone._children["embedder"](
            params["backbone"]["embedder"], jnp.asarray(flat, self.dtype))
        _, hidden_states = self.backbone._children["encoder"](
            params["backbone"]["encoder"], x)
        feat = hidden_states[self.out_stage]
        grid = self.grid_encoder_conv(params["grid_encoder_conv"], feat)
        # 2x2 max pool stride 2 + relu
        n, c, h, w = grid.shape
        grid = grid[:, :, : h // 2 * 2, : w // 2 * 2]
        grid = grid.reshape(n, c, h // 2, 2, w // 2, 2).max((3, 5))
        grid = jax.nn.relu(grid)
        nh, nw = grid.shape[2:]
        return grid.reshape(b, f, c, nh, nw).transpose(0, 1, 3, 4, 2)


class TvpVisualInputEmbedding(Module):
    """reference :176 — frame-mean grid + 2D row/col positions + type 0."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.position_embeddings = Embedding(config.max_position_embeddings, h, **kw)
        self.row_position_embeddings = Embedding(
            config.max_grid_row_position_embeddings, h, **kw)
        self.col_position_embeddings = Embedding(
            config.max_grid_col_position_embeddings, h, **kw)
        self.token_type_embeddings = Embedding(1, h, **kw)
        self.layer_norm = LayerNorm(h, config.layer_norm_eps,
                                    dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, grid):  # [B, F, H, W, C]
        b, f, h, w, c = grid.shape
        grid = grid.mean(axis=1)
        row = self.row_position_embeddings(params["row_position_embeddings"],
                                           jnp.arange(h))
        col = self.col_position_embeddings(params["col_position_embeddings"],
                                           jnp.arange(w))
        grid = grid + row[:, None, :] + col[None, :, :]
        tokens = grid.reshape(b, h * w, c)
        tokens = tokens + self.token_type_embeddings(
            params["token_type_embeddings"], jnp.zeros((b, h * w), jnp.int32))
        return self.layer_norm(params["layer_norm"], tokens)


class TvpTextInputEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.word_embeddings = Embedding(config.vocab_size, h, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings, h, **kw)
        self.token_type_embeddings = Embedding(config.type_vocab_size, h, **kw)
        self.layer_norm = LayerNorm(h, config.layer_norm_eps,
                                    dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_ids):
        b, s = input_ids.shape
        emb = self.word_embeddings(params["word_embeddings"], input_ids)
        emb = emb + self.position_embeddings(params["position_embeddings"],
                                             jnp.arange(s))[None]
        emb = emb + self.token_type_embeddings(
            params["token_type_embeddings"], jnp.zeros((b, s), jnp.int32))
        return self.layer_norm(params["layer_norm"], emb)


class TvpAttention(Module):
    """reference :325 — BERT attention with a fused output projection."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = h // self.num_heads
        self.query = Linear(h, h, **kw)
        self.key = Linear(h, h, **kw)
        self.value = Linear(h, h, **kw)
        self.dense = Linear(h, h, **kw)
        self.layer_norm = LayerNorm(h, config.layer_norm_eps,
                                    dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, bias):
        b, s, h = hidden.shape
        nh, hd = self.num_heads, self.head_dim
        q = self.query(params["query"], hidden).reshape(b, s, nh, hd)
        k = self.key(params["key"], hidden).reshape(b, s, nh, hd)
        v = self.value(params["value"], hidden).reshape(b, s, nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd ** -0.5
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, h)
        out = self.dense(params["dense"], out)
        return self.layer_norm(params["layer_norm"], hidden + out)


class TvpEncodeLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.attention = TvpAttention(config, **kw)
        inter = Module(**kw)
        inter._children["dense"] = Linear(h, config.intermediate_size, **lkw)
        self.intermediate = inter
        out = Module(**kw)
        out._children["dense"] = Linear(config.intermediate_size, h, **lkw)
        out._children["layer_norm"] = LayerNorm(h, config.layer_norm_eps, **kw)
        self.output = out
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, bias):
        attn = self.attention(params["attention"], hidden, bias)
        inter = self.act(self.intermediate._children["dense"](
            params["intermediate"]["dense"], attn))
        out = self.output._children["dense"](params["output"]["dense"], inter)
        return self.output._children["layer_norm"](
            params["output"]["layer_norm"], attn + out)


class TvpPooler(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden):
        return jnp.tanh(self.dense(params["dense"], hidden[:, 0]))


class TvpFramePadPrompter(Module):
    """reference :583 — learnable pad frames around each video frame."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.apply_mode = config.visual_prompter_apply
        self.num_frames = config.num_frames
        self.max_img_size = config.max_img_size
        self.prompt = config.visual_prompt_size
        self.base_size = config.max_img_size - 2 * config.visual_prompt_size

    def init(self, rng):
        ks = jax.random.split(rng, 4)
        f, p, m, b = (self.num_frames, self.prompt, self.max_img_size,
                      self.base_size)
        return {
            "pad_up": jax.random.normal(ks[0], (1, f, 3, p, m)).astype(self.param_dtype),
            "pad_down": jax.random.normal(ks[1], (1, f, 3, p, m)).astype(self.param_dtype),
            "pad_left": jax.random.normal(ks[2], (1, f, 3, b, p)).astype(self.param_dtype),
            "pad_right": jax.random.normal(ks[3], (1, f, 3, b, p)).astype(self.param_dtype),
        }

    def __call__(self, params, pixel_values):
        x = pixel_values
        if self.apply_mode in ("replace", "add"):
            base = jnp.zeros((1, self.num_frames, 3, self.base_size,
                              self.base_size), x.dtype)
            prompt = jnp.concatenate(
                [params["pad_left"].astype(x.dtype), base,
                 params["pad_right"].astype(x.dtype)], axis=4)
            prompt = jnp.concatenate(
                [params["pad_up"].astype(x.dtype), prompt,
                 params["pad_down"].astype(x.dtype)], axis=3)
            x = x + prompt
        return x


class TvpFrameDownPadPrompter(Module):
    """reference :546 — bottom-only pad."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.apply_mode = config.visual_prompter_apply
        self.num_frames = config.num_frames
        self.max_img_size = config.max_img_size
        self.prompt = config.visual_prompt_size

    def init(self, rng):
        return {"pad_down": jax.random.normal(
            rng, (1, self.num_frames, 3, self.prompt, self.max_img_size)
        ).astype(self.param_dtype)}

    def __call__(self, params, pixel_values):
        x = pixel_values
        m, p = self.max_img_size, self.prompt
        if self.apply_mode != "add":
            mask = jnp.ones((m, m), x.dtype).at[m - p:, :].set(0.0)
            x = x * mask
        if self.apply_mode != "remove":
            prompt = jnp.zeros(
                (x.shape[0], x.shape[1], 3, m, m), x.dtype)
            prompt = prompt.at[:, :, :, m - p:, :].set(
                params["pad_down"].astype(x.dtype))
            x = x + prompt
        return x


_PROMPTERS = {"framepad": TvpFramePadPrompter,
              "framedownpad": TvpFrameDownPadPrompter}


class TvpPreTrainedModel(PreTrainedModel):
    config_class = TvpConfig
    base_model_prefix = "model"
    _keys_to_ignore_on_load_unexpected = (r".*num_batches_tracked$",)


class TvpModel(Module):
    def __init__(self, config: TvpConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.vision_model = TvpVisionModel(config, **kw)
        self.embeddings = TvpTextInputEmbeddings(config, **kw)
        self.visual_embeddings = TvpVisualInputEmbedding(config, **kw)
        enc = Module(**kw)
        enc._children["layer"] = Module(**kw)
        for i in range(config.num_hidden_layers):
            enc._children["layer"]._children[str(i)] = TvpEncodeLayer(config, **kw)
        self.encoder = enc
        self.pooler = TvpPooler(config, **kw)
        self.visual_prompter = _PROMPTERS[config.visual_prompter_type](config, **kw)
        self.hidden_size = config.hidden_size

    def init(self, rng):
        params = super().init(rng)
        params["text_prompt"] = jax.random.normal(
            rng, (1, 10, self.hidden_size)).astype(self.param_dtype)
        return params

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None) -> BaseModelOutputWithPooling:
        pixels = self.visual_prompter(params["visual_prompter"],
                                      jnp.asarray(pixel_values, self.dtype))
        grid = self.vision_model(params["vision_model"], pixels)
        text = self.embeddings(params["embeddings"], jnp.asarray(input_ids))
        visual = self.visual_embeddings(params["visual_embeddings"], grid)
        b = text.shape[0]
        prompt = jnp.broadcast_to(params["text_prompt"].astype(text.dtype),
                                  (b, 10, text.shape[-1]))
        hidden = jnp.concatenate([prompt, text, visual], axis=1)
        bias = None
        if attention_mask is not None:
            am = jnp.asarray(attention_mask)
            full = jnp.concatenate(
                [jnp.ones((b, 10), am.dtype), am,
                 jnp.ones((b, visual.shape[1]), am.dtype)], axis=-1)
            bias = jnp.where(full[:, None, None, :].astype(bool), 0.0, NEG)
        for i in range(self.config.num_hidden_layers):
            hidden = self.encoder._children["layer"]._children[str(i)](
                params["encoder"]["layer"][str(i)], hidden, bias)
        pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(last_hidden_state=hidden,
                                          pooler_output=pooled)


class TvpForVideoGrounding(TvpPreTrainedModel):
    """reference :803."""

    def __init__(self, config: TvpConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = TvpModel(config, **kw)
        head = Module(**kw)
        lkw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        head._children["layer_0"] = Linear(config.hidden_size,
                                           config.hidden_size * 2, **lkw)
        head._children["layer_1"] = Linear(config.hidden_size * 2, 2, **lkw)
        self.video_grounding_head = head

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, labels=None,
                 **kwargs) -> TvpVideoGroundingOutput:
        out = self.model(params["model"], input_ids, pixel_values,
                         attention_mask)
        hp = params["video_grounding_head"]
        h = jax.nn.relu(self.video_grounding_head._children["layer_0"](
            hp["layer_0"], out.pooler_output))
        logits = jax.nn.sigmoid(
            self.video_grounding_head._children["layer_1"](hp["layer_1"], h))
        loss = None
        if labels is not None:
            duration, start, end = labels
            # reference TvpLoss: IoU + distance + duration terms
            ps, pe = logits[:, 0] * duration, logits[:, 1] * duration
            inter = jnp.clip(jnp.minimum(pe, end) - jnp.maximum(ps, start),
                             0, None)
            union = jnp.maximum(pe, end) - jnp.minimum(ps, start)
            iou_loss = 1 - inter / jnp.maximum(union, 1e-6)
            mid_pred, mid_true = (ps + pe) / 2, (start + end) / 2
            distance = jnp.abs(mid_pred - mid_true) / duration
            dur = jnp.abs((pe - ps) - (end - start)) / duration
            loss = (iou_loss
                    + self.config.distance_loss_weight * distance
                    + self.config.duration_loss_weight * dur).mean()
        return TvpVideoGroundingOutput(loss=loss, logits=logits)
