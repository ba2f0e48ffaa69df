from .configuration_vits import VitsConfig
from .modeling_vits import VitsModel, VitsModelOutput
from .tokenization_vits import VitsTokenizer
