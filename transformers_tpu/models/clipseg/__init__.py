from .configuration_clipseg import (
    CLIPSegConfig,
    CLIPSegTextConfig,
    CLIPSegVisionConfig,
)
from .modeling_clipseg import CLIPSegForImageSegmentation, CLIPSegModel
from .processing_clipseg import CLIPSegProcessor
