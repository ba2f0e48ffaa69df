from .configuration_chinese_clip import (ChineseCLIPConfig,
                                         ChineseCLIPTextConfig,
                                         ChineseCLIPVisionConfig)
from .modeling_chinese_clip import ChineseCLIPModel
from .processing_chinese_clip import ChineseCLIPProcessor
