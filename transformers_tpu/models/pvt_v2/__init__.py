from .modeling_pvt_v2 import (
    PvtV2Config,
    PvtV2ForImageClassification,
    PvtV2Model,
    PvtV2ModelStandalone,
)
