"""OwlViT configs (reference
src/transformers/models/owlvit/configuration_owlvit.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..clip.configuration_clip import CLIPTextConfig, CLIPVisionConfig


class OwlViTTextConfig(CLIPTextConfig):
    model_type = "owlvit_text_model"

    def __init__(self, vocab_size=49408, hidden_size=512, intermediate_size=2048,
                 num_hidden_layers=12, num_attention_heads=8, max_position_embeddings=16,
                 pad_token_id=0, bos_token_id=49406, eos_token_id=49407, **kwargs):
        super().__init__(vocab_size=vocab_size, hidden_size=hidden_size,
                         intermediate_size=intermediate_size,
                         num_hidden_layers=num_hidden_layers,
                         num_attention_heads=num_attention_heads,
                         max_position_embeddings=max_position_embeddings,
                         pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)


class OwlViTVisionConfig(CLIPVisionConfig):
    model_type = "owlvit_vision_model"

    def __init__(self, hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
                 num_attention_heads=12, image_size=768, patch_size=32, **kwargs):
        super().__init__(hidden_size=hidden_size, intermediate_size=intermediate_size,
                         num_hidden_layers=num_hidden_layers,
                         num_attention_heads=num_attention_heads,
                         image_size=image_size, patch_size=patch_size, **kwargs)


class OwlViTConfig(PretrainedConfig):
    model_type = "owlvit"
    sub_configs = {"text_config": OwlViTTextConfig, "vision_config": OwlViTVisionConfig}

    def __init__(self, text_config=None, vision_config=None, projection_dim=512,
                 logit_scale_init_value=2.6592, **kwargs):
        if isinstance(text_config, dict) or text_config is None:
            text_config = OwlViTTextConfig(**(text_config or {}))
        if isinstance(vision_config, dict) or vision_config is None:
            vision_config = OwlViTVisionConfig(**(vision_config or {}))
        self.text_config = text_config
        self.vision_config = vision_config
        self.projection_dim = projection_dim
        self.logit_scale_init_value = logit_scale_init_value
        super().__init__(**kwargs)
