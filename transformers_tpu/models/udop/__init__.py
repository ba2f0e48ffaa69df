from .configuration_udop import UdopConfig
from .modeling_udop import (
    UdopEncoderModel,
    UdopForConditionalGeneration,
    UdopModel,
)
from .processing_udop import UdopProcessor
