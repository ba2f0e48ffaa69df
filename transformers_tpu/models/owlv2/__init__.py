from .modeling_owlv2 import Owlv2Config, Owlv2ForObjectDetection
from .image_processing_owlv2 import Owlv2ImageProcessor
from .processing_owlv2 import Owlv2Processor
