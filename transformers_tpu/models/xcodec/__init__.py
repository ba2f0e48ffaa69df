from .configuration_xcodec import XcodecConfig
from .modeling_xcodec import XcodecModel
