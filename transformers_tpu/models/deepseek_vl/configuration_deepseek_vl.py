"""DeepseekVL config (reference src/transformers/models/deepseek_vl/configuration_deepseek_vl.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class DeepseekVLConfig(PretrainedConfig):
    model_type = "deepseek_vl"
    sub_configs = {"text_config": "auto", "vision_config": "auto"}

    def __init__(self, text_config=None, vision_config=None, image_token_id=100015,
                 tie_word_embeddings=True, **kwargs):
        from ..auto.configuration_auto import AutoConfig

        if text_config is None:
            text_config = {}
        if isinstance(text_config, dict):
            model_type = text_config.get("model_type", "llama")
            text_config = AutoConfig.for_model_type(
                model_type, **{k: v for k, v in text_config.items() if k != "model_type"})
        if vision_config is None:
            vision_config = {}
        if isinstance(vision_config, dict):
            model_type = vision_config.get("model_type", "siglip_vision_model")
            vision_config = AutoConfig.for_model_type(
                model_type, **{k: v for k, v in vision_config.items() if k != "model_type"})
        self.text_config = text_config
        self.vision_config = vision_config
        self.image_token_id = image_token_id
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)
