"""InstructBLIP config (reference src/transformers/models/instructblip/configuration_instructblip.py)."""

from __future__ import annotations

from ..blip_2.configuration_blip_2 import Blip2Config, Blip2QFormerConfig, Blip2VisionConfig


class InstructBlipVisionConfig(Blip2VisionConfig):
    model_type = "instructblip_vision_model"


class InstructBlipQFormerConfig(Blip2QFormerConfig):
    model_type = "instructblip_qformer"


class InstructBlipConfig(Blip2Config):
    model_type = "instructblip"
    sub_configs = {"vision_config": InstructBlipVisionConfig,
                   "qformer_config": InstructBlipQFormerConfig, "text_config": "auto"}

    def __init__(self, vision_config=None, qformer_config=None, text_config=None,
                 num_query_tokens=32, image_token_index=None, **kwargs):
        vision_config = (InstructBlipVisionConfig(**vision_config)
                         if isinstance(vision_config, dict)
                         else vision_config or InstructBlipVisionConfig())
        qformer_config = (InstructBlipQFormerConfig(**qformer_config)
                          if isinstance(qformer_config, dict)
                          else qformer_config or InstructBlipQFormerConfig())
        super().__init__(vision_config=vision_config, qformer_config=qformer_config,
                         text_config=text_config, num_query_tokens=num_query_tokens,
                         image_token_index=image_token_index, **kwargs)
