from .configuration_altclip import (AltCLIPConfig, AltCLIPTextConfig,
                                    AltCLIPVisionConfig)
from .modeling_altclip import AltCLIPModel
from .processing_altclip import AltCLIPProcessor
