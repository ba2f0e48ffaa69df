"""VisionTextDualEncoder config (reference
src/transformers/models/vision_text_dual_encoder/configuration_vision_text_dual_encoder.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class VisionTextDualEncoderConfig(PretrainedConfig):
    model_type = "vision-text-dual-encoder"
    sub_configs = {"vision_config": "auto", "text_config": "auto"}

    def __init__(self, vision_config=None, text_config=None, projection_dim=512,
                 logit_scale_init_value=2.6592, **kwargs):
        from ..auto.configuration_auto import AutoConfig

        if isinstance(vision_config, dict):
            mt = vision_config.get("model_type", "clip_vision_model")
            if mt == "clip":
                vision_config = AutoConfig.for_model_type(
                    "clip_vision_model",
                    **vision_config.get("vision_config", {}))
            else:
                vision_config = AutoConfig.for_model_type(
                    mt, **{k: v for k, v in vision_config.items()
                           if k != "model_type"})
        if isinstance(text_config, dict):
            text_config = AutoConfig.for_model_type(
                text_config.get("model_type", "bert"),
                **{k: v for k, v in text_config.items() if k != "model_type"})
        self.vision_config = vision_config
        self.text_config = text_config
        self.projection_dim = projection_dim
        self.logit_scale_init_value = logit_scale_init_value
        super().__init__(**kwargs)
