from .configuration_csm import CsmConfig, CsmDepthDecoderConfig
from .modeling_csm import CsmForConditionalGeneration
