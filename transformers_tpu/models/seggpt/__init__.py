from .configuration_seggpt import SegGptConfig
from .modeling_seggpt import SegGptForImageSegmentation, SegGptModel
