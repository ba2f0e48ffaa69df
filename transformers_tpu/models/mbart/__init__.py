from .configuration_mbart import MBartConfig
from .modeling_mbart import MBartForConditionalGeneration, MBartModel
