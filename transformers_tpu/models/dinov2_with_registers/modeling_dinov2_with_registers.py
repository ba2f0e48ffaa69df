"""DINOv2-with-registers (reference
models/dinov2_with_registers/modular_dinov2_with_registers.py).

DINOv2 plus ``num_register_tokens`` learned tokens inserted between CLS and
the patch tokens after position embeddings (:196-201, positions are NOT
added to registers); the classification head averages only the patch tokens
past the registers (:253).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, normal_init
from ...modeling_utils import PreTrainedModel
from ..dinov2.configuration_dinov2 import Dinov2Config
from ..dinov2.modeling_dinov2 import (
    Dinov2Embeddings,
    Dinov2ForImageClassification,
    Dinov2Model,
)


class Dinov2WithRegistersConfig(Dinov2Config):
    model_type = "dinov2_with_registers"

    def __init__(self, num_register_tokens=4, **kwargs):
        self.num_register_tokens = num_register_tokens
        super().__init__(**kwargs)


class Dinov2WithRegistersEmbeddings(Dinov2Embeddings):
    def init(self, rng):
        params = super().init(rng)
        params["register_tokens"] = jnp.zeros(
            (1, self.config.num_register_tokens, self.config.hidden_size),
            self.param_dtype)
        return params

    def __call__(self, params, pixel_values, bool_masked_pos=None):
        x = super().__call__(params, pixel_values, bool_masked_pos)
        b = x.shape[0]
        regs = jnp.broadcast_to(params["register_tokens"].astype(x.dtype),
                                (b, self.config.num_register_tokens, x.shape[-1]))
        return jnp.concatenate([x[:, :1], regs, x[:, 1:]], axis=1)


class Dinov2WithRegistersModel(Dinov2Model):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        del self._children["embeddings"]
        object.__delattr__(self, "embeddings")
        self.embeddings = Dinov2WithRegistersEmbeddings(config, dtype=dtype,
                                                        param_dtype=param_dtype)


class Dinov2WithRegistersPreTrainedModel(PreTrainedModel):
    config_class = Dinov2WithRegistersConfig
    base_model_prefix = "dinov2_with_registers"
    main_input_name = "pixel_values"


class Dinov2WithRegistersModelStandalone(Dinov2WithRegistersPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.dinov2_with_registers = Dinov2WithRegistersModel(
            config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.dinov2_with_registers(params["dinov2_with_registers"],
                                          pixel_values, **kwargs)


class Dinov2WithRegistersForImageClassification(Dinov2WithRegistersPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.num_labels = config.num_labels
        self.dinov2_with_registers = Dinov2WithRegistersModel(
            config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_size * 2, config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values, labels=None, output_hidden_states=False,
                 **kwargs):
        outputs = self.dinov2_with_registers(
            params["dinov2_with_registers"], pixel_values,
            output_hidden_states=output_hidden_states)
        seq = outputs.last_hidden_state
        patch = seq[:, 1 + self.config.num_register_tokens:]
        feats = jnp.concatenate([seq[:, 0], jnp.mean(patch, axis=1)], axis=-1)
        logits = self.classifier(params["classifier"], feats)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        from ...modeling_outputs import ImageClassifierOutput

        return ImageClassifierOutput(loss=loss, logits=logits,
                                     hidden_states=outputs.hidden_states)
