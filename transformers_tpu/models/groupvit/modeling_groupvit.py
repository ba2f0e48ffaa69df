"""GroupViT, TPU-native (reference src/transformers/models/groupvit/modeling_groupvit.py).

CLIP-style contrastive model whose vision tower progressively *groups* patch
tokens: each stage appends learned group tokens, runs CLIP encoder layers over
the concatenation, then hard-assigns every image token to one group
(one-hot argmax over groups at inference — reference hard_softmax /
GroupViTAssignAttention, modeling_groupvit.py:160) and pools tokens into the
groups. Projection heads are Linear-BN-ReLU-Linear stacks
(reference modeling_groupvit.py:1117). Text tower == CLIP text transformer.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from ..clip.modeling_clip import CLIPEncoderLayer, CLIPTextTransformer
from ..levit.modeling_levit import _BN1d
from .configuration_groupvit import GroupViTConfig

# GroupViT's text encoder layers are the CLIP layers verbatim
# (reference "Copied from ... CLIP->GroupViT" markers).


@dataclass
class GroupViTOutput(ModelOutput):
    loss: Any = None
    logits_per_image: Any = None
    logits_per_text: Any = None
    segmentation_logits: Any = None
    text_embeds: Any = None
    image_embeds: Any = None
    text_model_output: Any = None
    vision_model_output: Any = None


class GroupViTMLP(Module):
    def __init__(self, config, hidden_size=None, intermediate_size=None,
                 output_size=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        hidden_size = hidden_size or config.hidden_size
        intermediate_size = intermediate_size or config.intermediate_size
        output_size = output_size or hidden_size
        self.fc1 = Linear(hidden_size, intermediate_size, True, **kw)
        self.fc2 = Linear(intermediate_size, output_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class GroupViTMixerMLP(GroupViTMLP):
    """Token-mixing MLP: operates across the token axis
    (reference modeling_groupvit.py:577)."""

    def __call__(self, params, x):
        return super().__call__(params, x.transpose(0, 2, 1)).transpose(0, 2, 1)


class GroupViTCrossAttention(Module):
    """Full (unmasked) multi-head attention, optional cross K/V source
    (reference GroupViTAttention, modeling_groupvit.py:583)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        d = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = d // self.num_heads
        self.scale = self.head_dim ** -0.5
        self.q_proj = Linear(d, d, True, **kw)
        self.k_proj = Linear(d, d, True, **kw)
        self.v_proj = Linear(d, d, True, **kw)
        self.out_proj = Linear(d, d, True, **kw)

    def __call__(self, params, hidden, key_source=None):
        src = key_source if key_source is not None else hidden
        b, s, d = hidden.shape
        sk = src.shape[1]
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], src).reshape(b, sk, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], src).reshape(b, sk, self.num_heads, self.head_dim)
        w = jnp.einsum("bqhd,bkhd->bhqk", q, k) * self.scale
        p = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(hidden.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, s, d)
        return self.out_proj(params["out_proj"], out)


class GroupViTCrossAttentionLayer(Module):
    """Reference modeling_groupvit.py:144."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attn = GroupViTCrossAttention(config, **kw)
        self.norm2 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.mlp = GroupViTMLP(config, **kw)
        self.norm_post = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, query, key):
        x = query + self.attn(params["attn"], query, key)
        x = x + self.mlp(params["mlp"], self.norm2(params["norm2"], x))
        return self.norm_post(params["norm_post"], x)


class GroupViTAssignAttention(Module):
    """Inference path of reference modeling_groupvit.py:160: hard one-hot
    assignment of each image token to its argmax group (dim = groups), then
    row-normalized pooling."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.scale = d ** -0.5
        self.assign_eps = config.assign_eps
        self.q_proj = Linear(d, d, True, **kw)
        self.k_proj = Linear(d, d, True, **kw)
        self.v_proj = Linear(d, d, True, **kw)
        self.proj = Linear(d, d, True, **kw)

    def __call__(self, params, query, key):
        value = self.v_proj(params["v_proj"], key)
        q = self.q_proj(params["q_proj"], query)
        k = self.k_proj(params["k_proj"], key)
        raw = jnp.einsum("bgd,bkd->bgk", q, k) * self.scale
        # hard_softmax over the GROUP axis (-2): one-hot argmax per image token
        idx = jnp.argmax(raw, axis=-2)
        attn = jax.nn.one_hot(idx, raw.shape[-2], axis=-2, dtype=raw.dtype)
        soft = jax.nn.softmax(raw.astype(jnp.float32), axis=-2).astype(raw.dtype)
        attn = attn / (attn.sum(axis=-1, keepdims=True) + self.assign_eps)
        out = jnp.einsum("bgk,bkd->bgd", attn, value)
        return self.proj(params["proj"], out), soft


class GroupViTTokenAssign(Module):
    """Reference modeling_groupvit.py:208."""

    def __init__(self, config, num_group_token, num_output_group, *, dtype,
                 param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        ratio = config.assign_mlp_ratio
        tokens_dim, channels_dim = int(ratio[0] * d), int(ratio[1] * d)
        self.norm_tokens = LayerNorm(d, config.layer_norm_eps, **kw)
        self.mlp_inter = GroupViTMixerMLP(config, num_group_token, tokens_dim,
                                          num_output_group, **kw)
        self.norm_post_tokens = LayerNorm(d, config.layer_norm_eps, **kw)
        self.norm_x = LayerNorm(d, config.layer_norm_eps, **kw)
        self.pre_assign_attn = GroupViTCrossAttentionLayer(config, **kw)
        self.assign = GroupViTAssignAttention(config, **kw)
        self.norm_new_x = LayerNorm(d, config.layer_norm_eps, **kw)
        self.mlp_channels = GroupViTMLP(config, d, channels_dim, d, **kw)

    def __call__(self, params, image_tokens, group_tokens):
        group_tokens = self.norm_tokens(params["norm_tokens"], group_tokens)
        image_tokens = self.norm_x(params["norm_x"], image_tokens)
        projected = self.mlp_inter(params["mlp_inter"], group_tokens)
        projected = self.norm_post_tokens(params["norm_post_tokens"], projected)
        projected = self.pre_assign_attn(params["pre_assign_attn"], projected,
                                         image_tokens)
        new_x, attention = self.assign(params["assign"], projected, image_tokens)
        new_x = new_x + projected
        new_x = new_x + self.mlp_channels(params["mlp_channels"],
                                          self.norm_new_x(params["norm_new_x"], new_x))
        return new_x, attention


class _GroupProjector(Module):
    """nn.Sequential(LayerNorm, MixerMLP) -> keys 0/1
    (reference modeling_groupvit.py:~530)."""

    def __init__(self, config, num_prev, num_out, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "0", LayerNorm(config.hidden_size, config.layer_norm_eps, **kw))
        setattr(self, "1", GroupViTMixerMLP(config, num_prev,
                                            config.hidden_size // 2, num_out, **kw))

    def __call__(self, params, x):
        h = getattr(self, "0")(params["0"], x)
        return getattr(self, "1")(params["1"], h)


class GroupViTStage(Module):
    """Reference modeling_groupvit.py:460."""

    def __init__(self, config, depth, num_prev_group_token, num_group_token,
                 num_output_group, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.num_group_token = num_group_token
        self.hidden_size = config.hidden_size
        self.layers = [CLIPEncoderLayer(config, **kw) for _ in range(depth)]
        if num_group_token > 0:
            self.downsample = GroupViTTokenAssign(config, num_group_token,
                                                  num_output_group, **kw)
        if num_prev_group_token > 0 and num_group_token > 0:
            self.group_projector = _GroupProjector(config, num_prev_group_token,
                                                   num_group_token, **kw)
        else:
            self.group_projector = None

    def init(self, rng):
        params = super().init(rng)
        if self.num_group_token > 0:
            params["group_token"] = jnp.zeros(
                (1, self.num_group_token, self.hidden_size), self.param_dtype)
        return params

    def __call__(self, params, hidden, prev_group_token):
        b = hidden.shape[0]
        group_token = None
        if self.num_group_token > 0:
            group_token = jnp.broadcast_to(
                params["group_token"].astype(hidden.dtype),
                (b, self.num_group_token, hidden.shape[-1]))
            if self.group_projector is not None:
                group_token = group_token + self.group_projector(
                    params["group_projector"], prev_group_token)
            x = jnp.concatenate([hidden, group_token], axis=1)
        else:
            x = hidden
        attn_args = {"is_causal": False}
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][str(i)], x, attn_args)
        if self.num_group_token > 0:
            hidden, group_token = (x[:, : -self.num_group_token],
                                   x[:, -self.num_group_token:])
            hidden, _ = self.downsample(params["downsample"], hidden, group_token)
        else:
            hidden = x
        return hidden, group_token


class GroupViTVisionEmbeddings(Module):
    """Conv patch embed -> LayerNorm -> +learned positions
    (reference modeling_groupvit.py:347; NOTE: LN before positions)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.num_patches = (config.image_size // config.patch_size) ** 2
        self.hidden_size = config.hidden_size
        self.patch_embeddings = _PatchProjection(config, **kw)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["position_embeddings"] = jnp.zeros(
            (1, self.num_patches, self.hidden_size), self.param_dtype)
        return params

    def __call__(self, params, pixel_values):
        x = self.patch_embeddings(params["patch_embeddings"], pixel_values)
        x = self.layernorm(params["layernorm"], x)
        return x + params["position_embeddings"].astype(x.dtype)


class _PatchProjection(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.projection = Conv(config.num_channels, config.hidden_size,
                               config.patch_size, stride=config.patch_size,
                               ndim=2, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values):
        x = self.projection(params["projection"], pixel_values)
        b, c = x.shape[0], x.shape[1]
        return x.reshape(b, c, -1).transpose(0, 2, 1)


class GroupViTVisionTransformer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = GroupViTVisionEmbeddings(config, **kw)
        stages = []
        for i in range(len(config.depths)):
            stages.append(GroupViTStage(
                config, config.depths[i],
                config.num_output_groups[i - 1] if i > 0 else 0,
                config.num_group_tokens[i], config.num_output_groups[i], **kw))
        self.encoder = _GroupViTVisionEncoder(stages, **kw)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values):
        h = self.embeddings(params["embeddings"],
                            jnp.asarray(pixel_values, self.dtype))
        group_tokens = None
        for i, stage in enumerate(self.encoder.stages):
            h, group_tokens = stage(params["encoder"]["stages"][str(i)], h,
                                    group_tokens)
        h = self.layernorm(params["layernorm"], h)
        return h, h.mean(axis=1)


class _GroupViTVisionEncoder(Module):
    def __init__(self, stages, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.stages = stages


class _ProjectionHead(Module):
    """nn.Sequential(Linear, BatchNorm1d, ReLU, Linear) -> keys 0/1/3
    (reference modeling_groupvit.py:1117)."""

    def __init__(self, in_dim, mid_dim, out_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "0", Linear(in_dim, mid_dim, True, **kw))
        setattr(self, "1", _BN1d(mid_dim, **kw))
        setattr(self, "3", Linear(mid_dim, out_dim, True, **kw))

    def __call__(self, params, x):
        h = getattr(self, "0")(params["0"], x)
        h = jax.nn.relu(getattr(self, "1")(params["1"], h))
        return getattr(self, "3")(params["3"], h)


class GroupViTPreTrainedModel(PreTrainedModel):
    config_class = GroupViTConfig
    base_model_prefix = ""
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked$",
                                          r"position_ids$")


class GroupViTModel(GroupViTPreTrainedModel):
    """Reference modeling_groupvit.py:1088."""

    main_input_name = "input_ids"

    def __init__(self, config: GroupViTConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_model = CLIPTextTransformer(config.text_config, **kw)
        self.vision_model = GroupViTVisionTransformer(config.vision_config, **kw)
        self.visual_projection = _ProjectionHead(
            config.vision_config.hidden_size, config.projection_intermediate_dim,
            config.projection_dim, **kw)
        self.text_projection = _ProjectionHead(
            config.text_config.hidden_size, config.projection_intermediate_dim,
            config.projection_dim, **kw)
        self.logit_scale_init_value = config.logit_scale_init_value

    def init(self, rng):
        params = super().init(rng)
        params["logit_scale"] = jnp.asarray(self.logit_scale_init_value,
                                            self.param_dtype)
        return params

    def get_text_features(self, params, input_ids, attention_mask=None):
        out = self.text_model(params["text_model"], input_ids, attention_mask)
        return self.text_projection(params["text_projection"], out.pooler_output)

    def get_image_features(self, params, pixel_values):
        _, pooled = self.vision_model(params["vision_model"], pixel_values)
        return self.visual_projection(params["visual_projection"], pooled)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, position_ids=None, return_loss=False,
                 **kwargs) -> GroupViTOutput:
        vision_hidden, vision_pooled = self.vision_model(params["vision_model"],
                                                         pixel_values)
        text_out = self.text_model(params["text_model"], input_ids,
                                   attention_mask, position_ids)
        image_embeds = self.visual_projection(params["visual_projection"],
                                              vision_pooled)
        text_embeds = self.text_projection(params["text_projection"],
                                           text_out.pooler_output)
        image_embeds = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
        text_embeds = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
        logit_scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        logits_per_text = jnp.dot(text_embeds.astype(jnp.float32),
                                  image_embeds.astype(jnp.float32).T) * logit_scale
        logits_per_image = logits_per_text.T
        loss = None
        if return_loss:
            from ...loss import cross_entropy

            labels = jnp.arange(logits_per_text.shape[0])
            loss = (cross_entropy(logits_per_text, labels)
                    + cross_entropy(logits_per_image, labels)) / 2.0
        return GroupViTOutput(
            loss=loss, logits_per_image=logits_per_image,
            logits_per_text=logits_per_text, text_embeds=text_embeds,
            image_embeds=image_embeds, text_model_output=text_out,
            vision_model_output=vision_hidden)
