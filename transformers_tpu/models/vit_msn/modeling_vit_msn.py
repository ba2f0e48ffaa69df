"""ViT-MSN (reference models/vit_msn/modeling_vit_msn.py): a plain ViT whose
base prefix is ``vit`` and whose classifier reads the CLS token; the MSN
training head lives outside the checkpointed model."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Linear, normal_init
from ...modeling_outputs import ImageClassifierOutput
from ...modeling_utils import PreTrainedModel
from ..vit.configuration_vit import ViTConfig
from ..vit.modeling_vit import ViTModel


class ViTMSNConfig(ViTConfig):
    model_type = "vit_msn"


class ViTMSNPreTrainedModel(PreTrainedModel):
    config_class = ViTMSNConfig
    base_model_prefix = "vit"
    main_input_name = "pixel_values"


class ViTMSNModelStandalone(ViTMSNPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.vit = ViTModel(config, dtype=self.dtype, param_dtype=self.param_dtype,
                            add_pooling_layer=False)

    def __call__(self, params, pixel_values, **kwargs):
        return self.vit(params["vit"], pixel_values, **kwargs)


class ViTMSNForImageClassification(ViTMSNPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.vit = ViTModel(config, dtype=self.dtype, param_dtype=self.param_dtype,
                            add_pooling_layer=False)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values, labels=None,
                 output_hidden_states=False, **kwargs):
        outputs = self.vit(params["vit"], pixel_values, output_hidden_states)
        logits = self.classifier(params["classifier"], outputs.last_hidden_state[:, 0])
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ImageClassifierOutput(loss=loss, logits=logits,
                                     hidden_states=outputs.hidden_states)
