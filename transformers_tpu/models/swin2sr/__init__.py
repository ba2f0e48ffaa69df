"""Swin2SR (reference models/swin2sr/)."""
from .configuration_swin2sr import Swin2SRConfig
from .modeling_swin2sr import Swin2SRForImageSuperResolution
