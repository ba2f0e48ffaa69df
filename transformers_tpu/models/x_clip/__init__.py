from .configuration_x_clip import XCLIPConfig, XCLIPTextConfig, XCLIPVisionConfig
from .modeling_x_clip import XCLIPModel
from .processing_x_clip import XCLIPProcessor
