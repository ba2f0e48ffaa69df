"""PaliGemma config (reference src/transformers/models/paligemma/configuration_paligemma.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class PaliGemmaConfig(PretrainedConfig):
    model_type = "paligemma"
    sub_configs = {"text_config": "auto", "vision_config": "auto"}

    def __init__(
        self,
        vision_config=None,
        text_config=None,
        image_token_index=256000,
        projection_dim=2048,
        hidden_size=2048,
        **kwargs,
    ):
        from ..auto.configuration_auto import AutoConfig

        if isinstance(vision_config, dict):
            vision_config = AutoConfig.for_model_type(
                vision_config.get("model_type", "siglip_vision_model"),
                **{k: v for k, v in vision_config.items() if k != "model_type"})
        elif vision_config is None:
            from ..siglip.configuration_siglip import SiglipVisionConfig

            vision_config = SiglipVisionConfig()
        if isinstance(text_config, dict):
            text_config = AutoConfig.for_model_type(
                text_config.get("model_type", "gemma"),
                **{k: v for k, v in text_config.items() if k != "model_type"})
        elif text_config is None:
            from ..gemma.configuration_gemma import GemmaConfig

            text_config = GemmaConfig()
        self.vision_config = vision_config
        self.text_config = text_config
        # the projector output width rides on the vision sub-config
        # (reference configuration_paligemma.py)
        if getattr(vision_config, "projection_dim", None) is None:
            vision_config.projection_dim = projection_dim
        self.image_token_index = image_token_index
        self.image_token_id = image_token_index
        self.projection_dim = projection_dim
        self.hidden_size = hidden_size
        super().__init__(**kwargs)
