from .configuration_moonshine import MoonshineConfig
from .modeling_moonshine import (MoonshineForConditionalGeneration,
                                 MoonshineModel)
