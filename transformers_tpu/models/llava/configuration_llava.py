"""LLaVA config (reference src/transformers/models/llava/configuration_llava.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class LlavaConfig(PretrainedConfig):
    model_type = "llava"
    sub_configs = {"text_config": "auto", "vision_config": "auto"}

    def __init__(
        self,
        vision_config=None,
        text_config=None,
        image_token_index=32000,
        projector_hidden_act="gelu",
        vision_feature_select_strategy="default",
        vision_feature_layer=-2,
        image_seq_length=576,
        multimodal_projector_bias=True,
        **kwargs,
    ):
        from ..auto.configuration_auto import AutoConfig

        if isinstance(vision_config, dict):
            vision_config = AutoConfig.for_model_type(
                vision_config.get("model_type", "clip_vision_model"),
                **{k: v for k, v in vision_config.items() if k != "model_type"})
        elif vision_config is None:
            from ..clip.configuration_clip import CLIPVisionConfig

            vision_config = CLIPVisionConfig()
        if isinstance(text_config, dict):
            text_config = AutoConfig.for_model_type(
                text_config.get("model_type", "llama"),
                **{k: v for k, v in text_config.items() if k != "model_type"})
        elif text_config is None:
            from ..llama.configuration_llama import LlamaConfig

            text_config = LlamaConfig()
        self.vision_config = vision_config
        self.text_config = text_config
        self.image_token_index = image_token_index
        self.image_token_id = image_token_index
        self.projector_hidden_act = projector_hidden_act
        self.vision_feature_select_strategy = vision_feature_select_strategy
        self.vision_feature_layer = vision_feature_layer
        self.image_seq_length = image_seq_length
        self.multimodal_projector_bias = multimodal_projector_bias
        super().__init__(**kwargs)
