from .configuration_chameleon import ChameleonConfig, ChameleonVQVAEConfig
from .modeling_chameleon import (ChameleonForConditionalGeneration,
                                 ChameleonModel, ChameleonModelStandalone,
                                 ChameleonVQVAE)
from .image_processing_chameleon import ChameleonImageProcessor
from .processing_chameleon import ChameleonProcessor
