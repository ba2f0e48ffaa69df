from .configuration_encodec import EncodecConfig
from .modeling_encodec import EncodecModel
