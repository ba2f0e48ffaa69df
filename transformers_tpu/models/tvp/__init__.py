from .modeling_tvp import TvpConfig, TvpForVideoGrounding, TvpModel
