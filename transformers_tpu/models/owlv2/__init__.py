from .modeling_owlv2 import Owlv2Config, Owlv2ForObjectDetection
