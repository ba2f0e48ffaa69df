"""DeiT (reference src/transformers/models/deit/modeling_deit.py).

ViT encoder with an extra distillation token: embeddings are
[CLS, DIST, patches...] with positions sized N+2. Heads: plain classifier on
CLS (DeiTForImageClassification) and the teacher variant averaging the CLS
and distillation classifiers (DeiTForImageClassificationWithTeacher).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, ImageClassifierOutput
from ...modeling_utils import PreTrainedModel
from ..vit.modeling_vit import ViTEncoder, ViTPatchEmbeddings, ViTPooler
from .configuration_deit import DeiTConfig


class DeiTEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_embeddings = ViTPatchEmbeddings(config, dtype=dtype, param_dtype=param_dtype)
        self.num_patches = (config.image_size // config.patch_size) ** 2

    def init(self, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        init = normal_init(self.config.initializer_range)
        h = self.config.hidden_size
        return {
            "cls_token": init(k1, (1, 1, h), self.param_dtype),
            "distillation_token": init(k2, (1, 1, h), self.param_dtype),
            "position_embeddings": init(k3, (1, self.num_patches + 2, h), self.param_dtype),
            "patch_embeddings": self.patch_embeddings.init(k4),
        }

    def __call__(self, params, pixel_values):
        patches = self.patch_embeddings(params["patch_embeddings"], pixel_values)
        b = patches.shape[0]
        cls = jnp.broadcast_to(params["cls_token"].astype(self.dtype), (b, 1, patches.shape[-1]))
        dist = jnp.broadcast_to(params["distillation_token"].astype(self.dtype), (b, 1, patches.shape[-1]))
        x = jnp.concatenate([cls, dist, patches], axis=1)
        return x + params["position_embeddings"].astype(self.dtype)


class DeiTModel(Module):
    def __init__(self, config: DeiTConfig, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = DeiTEmbeddings(config, **kw)
        self.encoder = ViTEncoder(config, **kw)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.pooler = ViTPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, pixel_values, output_hidden_states=False,
                 output_attentions=False) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], pixel_values)
        probs_sink = [] if output_attentions else None
        hidden, all_hidden = self.encoder(params["encoder"], hidden, output_hidden_states, probs_sink)
        hidden = self.layernorm(params["layernorm"], hidden)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
            attentions=tuple(probs_sink) if probs_sink is not None else None,
        )


class DeiTPreTrainedModel(PreTrainedModel):
    config_class = DeiTConfig
    base_model_prefix = "deit"
    main_input_name = "pixel_values"


class DeiTModelStandalone(DeiTPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.deit = DeiTModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.deit(params["deit"], pixel_values, **kwargs)


class DeiTForImageClassification(DeiTPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.num_labels = config.num_labels
        self.deit = DeiTModel(config, dtype=self.dtype, param_dtype=self.param_dtype,
                              add_pooling_layer=False)
        self.classifier = Linear(config.hidden_size, config.num_labels, True, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values, labels=None, output_hidden_states=False,
                 **kwargs) -> ImageClassifierOutput:
        outputs = self.deit(params["deit"], pixel_values, output_hidden_states)
        logits = self.classifier(params["classifier"], outputs.last_hidden_state[:, 0])
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ImageClassifierOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)


class DeiTForImageClassificationWithTeacher(DeiTPreTrainedModel):
    """cls + distillation classifier average (reference
    DeiTForImageClassificationWithTeacher)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.num_labels = config.num_labels
        self.deit = DeiTModel(config, dtype=self.dtype, param_dtype=self.param_dtype,
                              add_pooling_layer=False)
        lkw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        self.cls_classifier = Linear(config.hidden_size, config.num_labels, True, **lkw)
        self.distillation_classifier = Linear(config.hidden_size, config.num_labels, True, **lkw)

    def __call__(self, params, pixel_values, output_hidden_states=False,
                 **kwargs) -> ImageClassifierOutput:
        outputs = self.deit(params["deit"], pixel_values, output_hidden_states)
        cls_logits = self.cls_classifier(params["cls_classifier"], outputs.last_hidden_state[:, 0])
        dist_logits = self.distillation_classifier(params["distillation_classifier"],
                                                   outputs.last_hidden_state[:, 1])
        return ImageClassifierOutput(logits=(cls_logits + dist_logits) / 2,
                                     hidden_states=outputs.hidden_states)
