from .configuration_clap import ClapAudioConfig, ClapConfig, ClapTextConfig
from .feature_extraction_clap import ClapFeatureExtractor
from .modeling_clap import ClapAudioModel, ClapModel, ClapTextModel
from .processing_clap import ClapProcessor
