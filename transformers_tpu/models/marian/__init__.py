from .configuration_marian import MarianConfig
from .modeling_marian import MarianModel, MarianMTModel
