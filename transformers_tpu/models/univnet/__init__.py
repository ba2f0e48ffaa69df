from .modeling_univnet import UnivNetConfig, UnivNetModel
