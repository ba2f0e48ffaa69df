"""ViViT (reference models/vivit/modeling_vivit.py): video ViT with 3D
tubelet patch embeddings (:36 Conv3d stride=tubelet), CLS token, gelu_fast
MLPs, tanh pooler."""

from __future__ import annotations

import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (BaseModelOutputWithPooling,
                                 ImageClassifierOutput)
from ...modeling_utils import PreTrainedModel
from ..vit.modeling_vit import ViTEncoder, ViTPooler


class VivitConfig(PretrainedConfig):
    model_type = "vivit"

    def __init__(self, image_size=224, num_frames=32, tubelet_size=None,
                 num_channels=3, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072,
                 hidden_act="gelu_fast", hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0, initializer_range=0.02,
                 layer_norm_eps=1e-6, qkv_bias=True, **kwargs):
        self.image_size = image_size
        self.num_frames = num_frames
        self.tubelet_size = tubelet_size if tubelet_size is not None else [2, 16, 16]
        self.num_channels = num_channels
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.qkv_bias = qkv_bias
        # ViTPooler compatibility
        self.pooler_output_size = hidden_size
        self.pooler_act = "tanh"
        super().__init__(**kwargs)


class VivitEmbeddings(Module):
    def __init__(self, config: VivitConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        t, ph, pw = config.tubelet_size
        self.num_patches = ((config.image_size // pw) * (config.image_size // ph)
                            * (config.num_frames // t))

    def init(self, rng):
        import jax

        c = self.config
        t, ph, pw = c.tubelet_size
        k1, k2, k3 = jax.random.split(rng, 3)
        init = normal_init(c.initializer_range)
        return {
            "cls_token": init(k1, (1, 1, c.hidden_size), self.param_dtype),
            "position_embeddings": init(k2, (1, self.num_patches + 1, c.hidden_size),
                                        self.param_dtype),
            "patch_embeddings": {"projection": {
                "weight": init(k3, (c.hidden_size, c.num_channels, t, ph, pw),
                               self.param_dtype),
                "bias": jnp.zeros((c.hidden_size,), self.param_dtype)}},
        }

    def __call__(self, params, pixel_values):  # [B, F, C, H, W]
        c = self.config
        t, ph, pw = c.tubelet_size
        b, f, ch, hh, ww = pixel_values.shape
        # conv3d stride=kernel as reshape-matmul; torch output order is
        # (frames, rows, cols) flattened
        x = pixel_values.transpose(0, 2, 1, 3, 4)  # [B, C, F, H, W]
        x = x.reshape(b, ch, f // t, t, hh // ph, ph, ww // pw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
            b, (f // t) * (hh // ph) * (ww // pw), ch * t * ph * pw)
        w = params["patch_embeddings"]["projection"]["weight"].astype(self.dtype)
        patches = (x.astype(self.dtype) @ w.reshape(w.shape[0], -1).T
                   + params["patch_embeddings"]["projection"]["bias"].astype(self.dtype))
        cls = jnp.broadcast_to(params["cls_token"].astype(self.dtype),
                               (b, 1, c.hidden_size))
        h = jnp.concatenate([cls, patches], axis=1)
        return h + params["position_embeddings"].astype(self.dtype)


class VivitPreTrainedModel(PreTrainedModel):
    config_class = VivitConfig
    base_model_prefix = "vivit"
    main_input_name = "pixel_values"


class VivitModel(VivitPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None,
                 add_pooling_layer=True):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = VivitEmbeddings(config, **kw)
        self.encoder = ViTEncoder(config, **kw)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.pooler = ViTPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        hidden = self.embeddings(params["embeddings"], pixel_values)
        hidden, all_hidden = self.encoder(params["encoder"], hidden,
                                          output_hidden_states, None)
        hidden = self.layernorm(params["layernorm"], hidden)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class VivitForVideoClassification(VivitPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.vivit = VivitModel(config, dtype=self.dtype, param_dtype=self.param_dtype,
                                add_pooling_layer=False)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values, labels=None,
                 output_hidden_states=False, **kwargs):
        outputs = self.vivit(params["vivit"], pixel_values, output_hidden_states)
        logits = self.classifier(params["classifier"], outputs.last_hidden_state[:, 0])
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ImageClassifierOutput(loss=loss, logits=logits,
                                     hidden_states=outputs.hidden_states)
