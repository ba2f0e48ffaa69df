"""I-JEPA (reference models/ijepa/modeling_ijepa.py): ViT without a CLS
token — position embeddings cover patches only (:63); classification pools
by mean over patch tokens."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...modeling_outputs import ImageClassifierOutput
from ...modeling_utils import PreTrainedModel
from ..vit.configuration_vit import ViTConfig
from ..vit.modeling_vit import ViTModel, ViTPatchEmbeddings


class IJepaConfig(ViTConfig):
    model_type = "ijepa"


class IJepaEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_embeddings = ViTPatchEmbeddings(config, dtype=dtype,
                                                   param_dtype=param_dtype)
        self.num_patches = (config.image_size // config.patch_size) ** 2

    def init(self, rng):
        import jax

        k1, k2 = jax.random.split(rng)
        return {
            "position_embeddings": normal_init(self.config.initializer_range)(
                k1, (1, self.num_patches, self.config.hidden_size), self.param_dtype),
            "patch_embeddings": self.patch_embeddings.init(k2),
        }

    def __call__(self, params, pixel_values):
        patches = self.patch_embeddings(params["patch_embeddings"], pixel_values)
        return patches + params["position_embeddings"].astype(self.dtype)


class IJepaModel(ViTModel):
    embeddings_cls = IJepaEmbeddings

    def __init__(self, config, *, dtype, param_dtype, add_pooling_layer=False):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype,
                         add_pooling_layer=add_pooling_layer)
        del self._children["embeddings"]
        object.__delattr__(self, "embeddings")
        self.embeddings = IJepaEmbeddings(config, dtype=dtype, param_dtype=param_dtype)


class IJepaPreTrainedModel(PreTrainedModel):
    config_class = IJepaConfig
    base_model_prefix = "ijepa"
    main_input_name = "pixel_values"


class IJepaModelStandalone(IJepaPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.ijepa = IJepaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.ijepa(params["ijepa"], pixel_values, **kwargs)


class IJepaForImageClassification(IJepaPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.ijepa = IJepaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values, labels=None,
                 output_hidden_states=False, **kwargs):
        outputs = self.ijepa(params["ijepa"], pixel_values, output_hidden_states)
        logits = self.classifier(params["classifier"],
                                 outputs.last_hidden_state.mean(axis=1))
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ImageClassifierOutput(loss=loss, logits=logits,
                                     hidden_states=outputs.hidden_states)
