"""VitPose backbone (reference models/vitpose_backbone/modeling_vitpose_backbone.py).

ViT with a non-square patch grid, a conv patch projection padded by 2
(:61), NO cls token in the sequence — the stored [1, P+1] position table
adds ``pos[1:]`` to patches plus the ``pos[:1]`` slot broadcast (:88-96) —
and optionally a per-dataset Mixture-of-Experts MLP whose expert slice is
concatenated after the shared slice (:219-269).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn


class VitPoseBackboneConfig(PretrainedConfig):
    model_type = "vitpose_backbone"

    def __init__(self, image_size=(256, 192), patch_size=(16, 16), num_channels=3,
                 hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
                 mlp_ratio=4, num_experts=1, part_features=256, hidden_act="gelu",
                 hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                 initializer_range=0.02, layer_norm_eps=1e-12, qkv_bias=True,
                 out_features=None, out_indices=None, **kwargs):
        self.image_size = list(image_size)
        self.patch_size = list(patch_size)
        self.num_channels = num_channels
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.mlp_ratio = mlp_ratio
        self.num_experts = num_experts
        self.part_features = part_features
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.qkv_bias = qkv_bias
        self.out_features = out_features
        self.out_indices = out_indices
        super().__init__(**kwargs)


class VitPoseBackboneEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        ph, pw = config.patch_size
        self.patch_embeddings = Module(dtype=dtype, param_dtype=param_dtype)
        self.patch_embeddings.projection = Conv(
            config.num_channels, config.hidden_size, (ph, pw), stride=(ph, pw),
            padding=2, use_bias=True, ndim=2, dtype=dtype, param_dtype=param_dtype)
        self.num_patches = ((config.image_size[0] // ph)
                            * (config.image_size[1] // pw))

    def init(self, rng):
        params = super().init(rng)
        params["position_embeddings"] = normal_init(self.config.initializer_range)(
            rng, (1, self.num_patches + 1, self.config.hidden_size), self.param_dtype)
        return params

    def __call__(self, params, pixel_values):
        x = self.patch_embeddings.projection(
            params["patch_embeddings"]["projection"], pixel_values)  # [B, E, H', W']
        b, e = x.shape[:2]
        x = x.reshape(b, e, -1).transpose(0, 2, 1)
        pos = params["position_embeddings"].astype(x.dtype)
        return x + pos[:, 1:] + pos[:, :1]


class _SelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.query = Linear(h, h, config.qkv_bias, **kw)
        self.key = Linear(h, h, config.qkv_bias, **kw)
        self.value = Linear(h, h, config.qkv_bias, **kw)

    def __call__(self, params, hidden):
        b, s, e = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        return attn_fn(q, k, v, scale=self.head_dim**-0.5, is_causal=False).reshape(b, s, e)


class VitPoseBackboneLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.config = config
        attention = Module(**kw)
        attention.attention = _SelfAttention(config, **kw)
        out = Module(**kw)
        out.dense = Linear(config.hidden_size, config.hidden_size, True, **lkw)
        attention.output = out
        self.attention = attention
        inner = int(config.hidden_size * config.mlp_ratio)
        mlp = Module(**kw)
        mlp.fc1 = Linear(config.hidden_size, inner, True, **lkw)
        if config.num_experts == 1:
            mlp.fc2 = Linear(inner, config.hidden_size, True, **lkw)
        else:
            mlp.fc2 = Linear(inner, config.hidden_size - config.part_features, True, **lkw)
            experts = Module(**kw)
            for e in range(config.num_experts):
                setattr(experts, str(e), Linear(inner, config.part_features, True, **lkw))
            mlp.experts = experts
        self.mlp = mlp
        self.layernorm_before = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.layernorm_after = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, dataset_index=None):
        normed = self.layernorm_before(params["layernorm_before"], hidden)
        attn = self.attention.attention(params["attention"]["attention"], normed)
        attn = self.attention.output.dense(params["attention"]["output"]["dense"], attn)
        hidden = attn + hidden
        h = self.layernorm_after(params["layernorm_after"], hidden)
        inner = self.act(self.mlp.fc1(params["mlp"]["fc1"], h))
        shared = self.mlp.fc2(params["mlp"]["fc2"], inner)
        if self.config.num_experts == 1:
            out = shared
        else:
            if dataset_index is None:
                raise ValueError("dataset_index must be provided when using multiple "
                                 "experts (reference VitPoseBackboneLayer.forward).")
            pf = self.config.part_features
            expert_out = jnp.zeros((*inner.shape[:-1], pf), inner.dtype)
            sel = jnp.asarray(dataset_index).reshape(-1, 1, 1)
            for e in range(self.config.num_experts):
                eo = getattr(self.mlp.experts, str(e))(
                    params["mlp"]["experts"][str(e)], inner)
                expert_out = expert_out + eo * (sel == e)
            out = jnp.concatenate([shared, expert_out], axis=-1)
        return out + hidden


class VitPoseBackbone(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = VitPoseBackboneEmbeddings(config, **kw)
        encoder = Module(**kw)
        encoder.layer = [VitPoseBackboneLayer(config, **kw)
                         for _ in range(config.num_hidden_layers)]
        self.encoder = encoder
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values, dataset_index=None,
                 output_hidden_states=False, **kwargs):
        h = self.embeddings(params["embeddings"], pixel_values)
        all_hidden = [h] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layer):
            h = layer(params["encoder"]["layer"][str(i)], h, dataset_index)
            if output_hidden_states:
                all_hidden.append(h)
        feature = self.layernorm(params["layernorm"], h)
        return BaseModelOutput(
            last_hidden_state=feature,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class VitPoseBackbonePreTrainedModel(PreTrainedModel):
    config_class = VitPoseBackboneConfig
    base_model_prefix = "vit"
    main_input_name = "pixel_values"


class VitPoseBackboneStandalone(VitPoseBackbonePreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = VitPoseBackboneEmbeddings(config, **kw)
        encoder = Module(**kw)
        encoder.layer = [VitPoseBackboneLayer(config, **kw)
                         for _ in range(config.num_hidden_layers)]
        self.encoder = encoder
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values, dataset_index=None, **kwargs):
        h = self.embeddings(params["embeddings"], pixel_values)
        for i, layer in enumerate(self.encoder.layer):
            h = layer(params["encoder"]["layer"][str(i)], h, dataset_index)
        return BaseModelOutput(last_hidden_state=self.layernorm(params["layernorm"], h))
