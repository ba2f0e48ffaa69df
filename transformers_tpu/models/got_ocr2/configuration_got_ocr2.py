"""GOT-OCR2 config (reference models/got_ocr2/configuration_got_ocr2.py):
SAM-style ViTDet vision encoder + Qwen2 text decoder."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..qwen2.configuration_qwen2 import Qwen2Config
from ..sam.configuration_sam import SamVisionConfig


class GotOcr2VisionConfig(SamVisionConfig):
    model_type = "got_ocr2_vision_model"


class GotOcr2Config(PretrainedConfig):
    model_type = "got_ocr2"
    sub_configs = {"vision_config": GotOcr2VisionConfig,
                   "text_config": Qwen2Config}

    def __init__(self, vision_config=None, text_config=None,
                 image_token_index=151859, image_seq_length=576,
                 pad_token_id=-1, **kwargs):
        if isinstance(vision_config, dict):
            vision_config = GotOcr2VisionConfig(**{
                k: v for k, v in vision_config.items() if k != "model_type"})
        self.vision_config = vision_config or GotOcr2VisionConfig()
        if isinstance(text_config, dict):
            text_config = Qwen2Config(**{k: v for k, v in text_config.items()
                                         if k != "model_type"})
        self.text_config = text_config or Qwen2Config()
        self.image_token_index = image_token_index
        self.image_token_id = image_token_index
        self.image_seq_length = image_seq_length
        super().__init__(pad_token_id=pad_token_id, **kwargs)

    def get_text_config(self):
        return self.text_config
