from .configuration_hunyuan_v1_moe import HunYuanMoEV1Config
from .modeling_hunyuan_v1_moe import (
    HunYuanMoEV1ForCausalLM,
    HunYuanMoEV1Model,
    HunYuanMoEV1ModelStandalone,
)
